"""Skew-mitigation join operators for the 100 TB scale path.

The reference never needed these (single-parallelism Flink jobs), but a
1000-executor shuffle join dies on a hot key: every row with that key
lands in one reducer. Two standard mitigations, both semantics-preserving
(the parity oracle is the plain join):

- :func:`salted_join` — explode the SMALL side into ``buckets`` salted
  copies and scatter the big side's hot keys across those buckets with a
  DETERMINISTIC per-row salt (hash of a high-cardinality column — never
  ``rand()``, which breaks retry/replay determinism). One reducer's hot
  key becomes ``buckets`` reducers' shares. Cost: small side inflated
  ``buckets``-fold, so reserve it for dim-sized right sides that are
  still too big (or too key-skewed) to broadcast outright.
- AQE's runtime skew-join split (``spark.sql.adaptive.skewJoin``) covers
  the sort-merge case automatically; ``salted_join`` is for when the
  skew is known ahead of time or the join runs where AQE can't re-plan
  (e.g. inside a stream-static micro-batch plan).

At local test scale both plans execute in milliseconds; what the tests
pin is correctness (== unsalted join) and the plan shape (salt column in
the join keys, small side exploded exactly ``buckets``-fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    dist_col: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small ON big[on] == small[on]`` with key salting.

    ``dist_col`` must be a high-cardinality column of ``big`` (a row id,
    event id, order key): the per-row salt is ``pmod(hash(dist_col),
    buckets)``, deterministic across retries and replays. The small side
    is exploded once per salt value so every (key, salt) pair finds its
    match.
    """
    salted_big = big.withColumn(SALT_COL, F.pmod(F.hash(F.col(dist_col)), F.lit(buckets)))
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_big.join(salted_small, on=[on, SALT_COL], how=how)
    return out.drop(SALT_COL)


def heavy_hitters(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Join-key skew diagnostic: the ``top`` heaviest keys with their row
    counts and share of the table — the report that decides whether a join
    needs salting (:func:`salted_join`) or AQE skew handling.

    Count + share in one partial-combining hash agg; the top-k cut is
    TakeOrderedAndProject (per-partition heaps). The share denominator
    arrives via a one-row broadcast, never a driver collect.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("key_count"))
    total = df.groupBy().agg(F.count(F.lit(1)).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key,
            "key_count",
            F.round(F.col("key_count") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.col("key_count").desc(), key)
        .limit(top)
    )
