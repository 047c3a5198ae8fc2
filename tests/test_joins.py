"""Oracle parity for the join-shape operators (SURVEY.md J7/J8)."""

from __future__ import annotations

import pytest

from flink_realtime_datawarehouse_v3_spark import api

from .conftest import SF_SMOKE, assert_parity


@pytest.mark.parametrize(
    "name",
    ["interval_join_events", "join_activity_coupon_full_outer",
     "join_activity_coupon_right_outer", "join_salted_skew",
     "join_bucketed_colocated", "asof_join_events", "sessionize_events"],
)
def test_parity(spark, duck, name):
    df = api.QUERIES[name](spark, SF_SMOKE)
    assert_parity(df, duck, api.ORACLES[name], name)


def test_interval_join_non_vacuous(spark):
    assert api.QUERIES["interval_join_events"](spark, SF_SMOKE).count() > 0


def test_salted_join_equals_plain(spark):
    """Salting is semantics-preserving: salted plan == plain join, and the
    physical plan carries the salt in the join keys with the small side
    exploded buckets-fold."""
    from pyspark.sql import functions as F

    from flink_realtime_datawarehouse_v3_spark.operators.skew import salted_join
    from flink_realtime_datawarehouse_v3_spark.sources import tables

    l = tables.load(spark, SF_SMOKE, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_orderkey", "l_extendedprice"
    )
    p = tables.load(spark, SF_SMOKE, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    salted = salted_join(l, p, on="partkey", dist_col="l_orderkey", buckets=4)
    plain = l.join(p, on="partkey", how="inner")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    n_small, n_exploded = p.count(), p.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(3)))
    ).count()
    assert n_exploded == 4 * n_small


def test_bucketed_join_is_colocated(spark):
    """With broadcast off, the bucketed order facts must sort-merge join
    with ZERO exchanges below the join — the write-time bucketing replaced
    the per-query shuffle. The one remaining exchange is the final
    province aggregation."""
    import re

    from flink_realtime_datawarehouse_v3_spark.sources import bucketed

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = bucketed.province_revenue_colocated(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges == 1, f"expected only the agg exchange, got {n_exchanges}"
