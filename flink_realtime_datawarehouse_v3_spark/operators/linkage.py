"""Record linkage (entity resolution) over the customer dimension.

Beyond the reference surface (SURVEY §9): the reference warehouse takes
its dims as already-clean CDC rows; a real 100 TB lake ingests the same
entity from many upstreams with typo'd / truncated keys and has to
resolve them. This module is the staged blocked-ER shape every MDM /
identity-resolution pipeline runs at scale:

1. **Deterministic noise injection** (:func:`inject_noisy_customers`) —
   a seeded, arithmetic-only corruption of ``c_name`` (one character
   deleted or substituted at a key-derived position), mirrored
   row-for-row in the DuckDB oracle so the value-hash gate covers the
   synthesized dirty feed (same contract as ``sources/synth.py``).
2. **Multi-pass blocking** (:func:`er_candidates`) — candidates come
   from TWO equi-joins (name-prefix block, name-suffix block), never an
   all-pairs product. The pass pair carries a recall *guarantee*: a
   single character edit at position p either leaves the first
   ``PREFIX_LEN`` characters intact (p > PREFIX_LEN -> prefix pass
   hits) or leaves the last ``SUFFIX_LEN`` characters intact (a
   deletion/substitution strictly before them shifts nothing in the
   final SUFFIX_LEN slice) — so every single-edit variant is caught by
   at least one pass (pytest-pinned: 100% recall on the injected set).
3. **Verify on candidates only** (:func:`resolve_customers`) —
   Levenshtein + exact structured-attribute agreement (nation key,
   balance cents) runs on the blocked candidate set, not the quadratic
   corpus — the same cheap-filter -> expensive-verify shape as
   ``text_dedup.edit_distance_pairs``.

100 TB posture: both blocking passes are plain equi-joins Spark
shuffles on the block key (or broadcasts the smaller dirty feed —
AQE's call); block width is set by the key length, not the data size,
so PREFIX_LEN/SUFFIX_LEN scale with log10(N) exactly like any hash
prefix. The best-match cut is a keyed MIN aggregate (map-side
partials, never a global sort). No UDFs: corruption, blocking keys, and
``levenshtein`` are all Catalyst built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables

# One in ER_STRIDE customers emits a dirty variant; key-derived, so the
# dirty feed is a fixed fraction of the dim at every SF.
ER_STRIDE = 7
ER_PHASE = 3
# Variant keys live in a disjoint id space above every real custkey.
ER_KEY_OFFSET = 10_000_000
# "Customer#" is 9 chars; digits run 10..18 (1-based). The corrupted
# position is key-derived inside the digit span.
NAME_DIGIT_BASE = 10
NAME_DIGITS = 9
PREFIX_LEN = 13  # "Customer#" + first 4 digits
SUFFIX_LEN = 4  # last 4 digits


def _cents(c: F.Column) -> F.Column:
    return F.round(c * 100).cast("bigint")


def inject_noisy_customers(customer: DataFrame) -> DataFrame:
    """The synthetic dirty feed: every ER_STRIDE-th customer re-arrives
    with one key-derived character edit in its name (even keys: deletion;
    odd keys: substitution with 'x'), a fresh surrogate key, and its
    structured attributes (nation, balance) intact — the classic
    "same entity, typo'd natural key" ingest pathology.

    Pure integer/string arithmetic (substring/concat on key-derived
    positions), rendered identically in the DuckDB oracle, so the
    injected relation itself is covered by the value-hash gate.
    """
    base = customer.filter(
        F.col("c_custkey") % ER_STRIDE == ER_PHASE
    ).select(
        (F.col("c_custkey") + ER_KEY_OFFSET).alias("variant_key"),
        F.col("c_custkey").alias("true_key"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        (NAME_DIGIT_BASE + F.col("c_custkey") % NAME_DIGITS).alias("p"),
    )
    deleted = F.expr(
        "concat(substring(c_name, 1, p - 1), substring(c_name, p + 1))"
    )
    substituted = F.expr(
        "concat(substring(c_name, 1, p - 1), 'x', substring(c_name, p + 1))"
    )
    return base.select(
        "variant_key",
        "true_key",
        F.when(F.col("true_key") % 2 == 0, deleted)
        .otherwise(substituted)
        .alias("v_name"),
        F.col("c_nationkey").alias("v_nationkey"),
        _cents(F.col("c_acctbal")).alias("v_acctbal_cents"),
    )


def candidate_union(variants: DataFrame, clean: DataFrame) -> DataFrame:
    """The raw two-pass candidate union (prefix block ++ suffix block),
    WITHOUT pair de-duplication — a pair both passes catch appears
    twice. Streaming-safe: when ``variants`` is a stream the two joins
    are stream-static equi-joins and the union is a same-source self
    union, all stateless; consumers that aggregate per variant
    (:func:`resolve_online`) don't need the dedup, consumers that
    verify per pair (:func:`er_candidates`) add it.
    """
    v = variants.select(
        "variant_key",
        "v_name",
        "v_nationkey",
        "v_acctbal_cents",
        F.substring("v_name", 1, PREFIX_LEN).alias("k_pre"),
        F.expr(
            f"substring(v_name, length(v_name) - {SUFFIX_LEN - 1}, {SUFFIX_LEN})"
        ).alias("k_suf"),
    )
    c = clean.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        _cents(F.col("c_acctbal")).alias("c_acctbal_cents"),
        F.substring("c_name", 1, PREFIX_LEN).alias("k_pre"),
        F.expr(
            f"substring(c_name, length(c_name) - {SUFFIX_LEN - 1}, {SUFFIX_LEN})"
        ).alias("k_suf"),
    )
    cols = [
        "variant_key",
        "v_name",
        "v_nationkey",
        "v_acctbal_cents",
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal_cents",
    ]
    pre = v.join(c.drop("k_suf"), "k_pre").select(*cols)
    suf = v.join(c.drop("k_pre"), "k_suf").select(*cols)
    return pre.unionByName(suf)


def er_candidates(variants: DataFrame, clean: DataFrame) -> DataFrame:
    """Multi-pass blocked candidate pairs (variant_key x c_custkey).

    Two equi-join passes — prefix block and suffix block — unioned and
    de-duplicated (a pair both passes catch must verify once, not
    twice). Single-edit recall is structural (see module docstring);
    neither pass is ever an all-pairs product.
    """
    return candidate_union(variants, clean).distinct()


def _verified(cand: DataFrame) -> DataFrame:
    """The verify stage shared by the batch and online forms:
    Levenshtein + exact structured-attribute agreement, on candidates
    only."""
    return cand.filter(
        (F.levenshtein("v_name", "c_name") <= 2)
        & (F.col("v_nationkey") == F.col("c_nationkey"))
        & (F.col("v_acctbal_cents") == F.col("c_acctbal_cents"))
    ).select(
        "variant_key",
        "c_custkey",
        F.levenshtein("v_name", "c_name").cast("bigint").alias("name_dist"),
    )


def resolve_online(variant_stream: DataFrame, clean: DataFrame) -> DataFrame:
    """Resolve-on-arrival: the same block -> verify stages as the batch
    form, as stream-static joins, then a keyed MIN aggregate holding the
    best match seen so far per variant (struct ordering = (name_dist,
    c_custkey) — the batch form's exact tie-break).

    The agg form is deliberately stronger than per-batch arbitration:
    with a static clean side every candidate for a variant lands in the
    variant's own micro-batch, but the keyed min stays correct even if
    the dim is later made slowly-changing and a better candidate arrives
    in a later batch. State is one small struct per distinct variant
    key — the size of the OUTPUT, the floor for any keyed enrichment.
    Duplicate pairs from the two blocking passes need no dedup here:
    min() is idempotent under duplicates (the batch form's DISTINCT is
    a per-pair-verify economy, not a semantic requirement).
    """
    best = (
        _verified(candidate_union(variant_stream, clean))
        .groupBy("variant_key")
        .agg(F.min(F.struct("name_dist", "c_custkey")).alias("best"))
    )
    return best


def finish_online(snapshot: DataFrame) -> DataFrame:
    """Project the complete-mode snapshot to the batch entry's schema
    (runs on the bounded sink table, not inside the stream)."""
    return snapshot.select(
        F.col("variant_key").cast("bigint").alias("variant_key"),
        F.col("best.c_custkey").cast("bigint").alias("canonical_key"),
        F.col("best.name_dist").alias("name_dist"),
        (F.col("best.c_custkey") == F.col("variant_key") - ER_KEY_OFFSET)
        .cast("bigint")
        .alias("is_correct"),
    )


def resolve_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end blocked entity resolution: inject the dirty feed,
    block, verify (levenshtein <= 2 AND nation + balance-cents exact),
    keep the best match per variant (min distance, then min key — a
    keyed MIN-struct aggregate, map-side combinable).

    Output: one row per resolved variant with its winning canonical key,
    the name distance, and a self-auditing ``is_correct`` flag (the
    injection knows the truth; precision/recall are pytest-pinned at 1.0
    on this noise model).
    """
    customer = tables.load(spark, sf_dir, "customer")
    variants = inject_noisy_customers(customer)
    verified = _verified(candidate_union(variants, customer))
    # Best match as a keyed MIN over (dist, key) structs — one hash agg
    # with map-side partials instead of pair-DISTINCT + sort-window
    # (both extra shuffles); duplicate pairs from the two blocking
    # passes are absorbed by min()'s idempotence. Same shape as the
    # online form, so stream == batch is the same aggregation tree.
    return finish_online(
        verified.groupBy("variant_key").agg(
            F.min(F.struct("name_dist", "c_custkey")).alias("best")
        )
    )


def er_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-health companion (the ivf_cell_stats of the ER family):
    per blocking pass, how many candidate pairs each block contributes —
    the number the operator's cost is linear in. A hot block here is the
    ER analogue of a hot LSH bucket; the stats table is what a pipeline
    alerts on before a skewed block melts an executor.
    """
    customer = tables.load(spark, sf_dir, "customer")
    variants = inject_noisy_customers(customer)
    v = variants.select(
        F.substring("v_name", 1, PREFIX_LEN).alias("k_pre"),
        F.expr(
            f"substring(v_name, length(v_name) - {SUFFIX_LEN - 1}, {SUFFIX_LEN})"
        ).alias("k_suf"),
    )
    c = customer.select(
        F.substring("c_name", 1, PREFIX_LEN).alias("k_pre"),
        F.expr(
            f"substring(c_name, length(c_name) - {SUFFIX_LEN - 1}, {SUFFIX_LEN})"
        ).alias("k_suf"),
    )

    def per_pass(key: str, tag: str) -> DataFrame:
        vs = v.groupBy(key).agg(F.count(F.lit(1)).alias("n_dirty"))
        cs = c.groupBy(key).agg(F.count(F.lit(1)).alias("n_clean"))
        return vs.join(cs, key).select(
            F.lit(tag).alias("pass_name"),
            F.col(key).alias("block_key"),
            F.col("n_dirty").cast("bigint").alias("n_dirty"),
            F.col("n_clean").cast("bigint").alias("n_clean"),
            (F.col("n_dirty") * F.col("n_clean")).cast("bigint").alias("n_pairs"),
        )

    return per_pass("k_pre", "prefix").unionByName(per_pass("k_suf", "suffix"))
