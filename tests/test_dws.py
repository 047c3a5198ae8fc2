"""Oracle parity for the 11 DWS windowed-aggregation pipelines."""

from __future__ import annotations

import pytest

from flink_realtime_datawarehouse_v3_spark import api

from .conftest import SF_SMOKE, assert_parity

# The oracle-checked DWS window set (the approx A5 variant is rows-only
# by design and gated by its own tolerance test below).
DWS = [n for n in api.QUERIES if n.startswith("dws_") and n in api.ORACLES]


def test_count():
    assert len(DWS) == 11


@pytest.mark.parametrize("name", DWS)
def test_parity(spark, duck, name):
    df = api.QUERIES[name](spark, SF_SMOKE)
    assert_parity(df, duck, api.ORACLES[name], name)


def test_province_window_approx_within_tolerance(spark):
    """A5 scale path: the HLL++ variant must track the exact distinct
    count within the declared 2 % rsd (allowing ±max(1, 5%) per window)
    and agree exactly on the non-distinct aggregates."""
    from pyspark.sql import functions as F

    exact = api.QUERIES["dws_trade_province_order_window"](spark, SF_SMOKE)
    approx = api.QUERIES["dws_trade_province_order_window_approx"](spark, SF_SMOKE)
    keys = ["stt", "edt", "province_id"]
    j = exact.select(*keys, F.col("order_count").alias("c_exact"),
                     F.col("order_amount").alias("a_exact")).join(
        approx.select(*keys, F.col("order_count").alias("c_approx"),
                      F.col("order_amount").alias("a_approx")),
        on=keys, how="full_outer")
    assert j.filter(F.col("c_exact").isNull() | F.col("c_approx").isNull()).count() == 0
    bad = j.filter(
        F.abs(F.col("c_exact") - F.col("c_approx"))
        > F.greatest(F.lit(1), F.col("c_exact") * 0.05)
    ).count()
    assert bad == 0, f"{bad} windows outside distinct-count tolerance"
    assert j.filter(F.col("a_exact") != F.col("a_approx")).count() == 0


def test_dedup_tiebreak_stable_across_partitioning(spark):
    """The keep_first/keep_latest call sites order by a real changelog
    discriminator (create_time, activity_rule_id, coupon_id) — never the
    partition key — so the deduped result (and everything downstream) is
    identical under different shuffle-partition counts."""
    name = "dws_trade_order_window"
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted(map(str, api.QUERIES[name](spark, SF_SMOKE).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(map(str, api.QUERIES[name](spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert a == b
