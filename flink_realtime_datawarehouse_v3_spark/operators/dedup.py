"""Keyed-state dedup / flag operators (SURVEY.md §2.6, D1-D4) — batch forms.

The reference implements these with per-key ValueState + TTL; the batch-
parity equivalents are window functions (streaming variants live in
``streaming/stateful.py``):

- D1 first-per-day       (RT/app/dwd/DwdTrafficUniqueVisitorDetail.java:76-105)
- D2 first + new flags   (RT/app/dws/DwsTradePaymentSucWindow.java:137-172,
                          RT/app/dws/DwsTradeOrderWindow.java:123-169;
                          7-day-returning variant
                          RT/app/dws/DwsUserUserLoginWindow.java:93-129 — that
                          line 119 carries a precedence bug
                          ``cur - last/(86400000) >= 8``; we implement the
                          intended ``(cur-last)/day >= 8``)
- D3 keep-FIRST per key  (RT/app/dws/DwsTradeOrderWindow.java:84-108)
- D4 keep-LATEST per key (RT/app/dws/DwsTradePaymentSucWindow.java:85-121)

Scale: each is one hash-partitioned window pass on a high-cardinality key
(mid/uid/detail-id) — the same shuffle the reference's keyBy performs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_first(df: DataFrame, keys: Sequence[str], order: Sequence[str | Column]) -> DataFrame:
    """D3: keep the first row per key (dedup duplicated upstream rows)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def keep_latest(df: DataFrame, keys: Sequence[str], order: Sequence[str | Column]) -> DataFrame:
    """D4: keep the newest row per key (left-join retraction repair)."""
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() if isinstance(c, str) else c.desc() for c in order]
    )
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def first_per_day(
    df: DataFrame, keys: Sequence[str], date_col: Column, order: Sequence[str | Column]
) -> DataFrame:
    """D1: keep each key's first row per calendar day."""
    w = Window.partitionBy(*keys, date_col).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def uu_new_flags(
    df: DataFrame,
    key: str,
    date_col: Column,
    order: Sequence[str | Column],
    back_days: int | None = None,
) -> DataFrame:
    """D2: per-row unique-today / new-ever flags (+ optional returning-after-N
    flag on the first-of-day rows).

    Adds ``uu`` (1 on the key's first row of its day), ``new`` (1 on the
    key's first row ever), and — when ``back_days`` is set — ``back`` (1 on
    first-of-day rows whose previous active day is >= back_days older).
    """
    day_w = Window.partitionBy(key, date_col).orderBy(*order)
    ever_w = Window.partitionBy(key).orderBy(*order)
    out = (
        df.withColumn("__dt", date_col)
        .withColumn("__rn_day", F.row_number().over(day_w))
        .withColumn("__rn_ever", F.row_number().over(ever_w))
        .withColumn("uu", F.when(F.col("__rn_day") == 1, 1).otherwise(0).cast("long"))
        .withColumn("new", F.when(F.col("__rn_ever") == 1, 1).otherwise(0).cast("long"))
    )
    if back_days is not None:
        # lag over first-of-day rows only: previous active date of the key.
        uv_w = Window.partitionBy(key).orderBy("__dt")
        prev_dt = F.lag("__dt").over(uv_w)
        uv = out.filter(F.col("uu") == 1).withColumn(
            "back",
            F.when(
                prev_dt.isNotNull()
                & (F.datediff(F.to_date("__dt"), F.to_date(prev_dt)) >= back_days),
                1,
            )
            .otherwise(0)
            .cast("long"),
        )
        rest = out.filter(F.col("uu") == 0).withColumn("back", F.lit(0).cast("long"))
        out = uv.unionByName(rest)
    return out.drop("__rn_day", "__rn_ever", "__dt")
