"""AQE skew-join mitigation — the runtime half of the skew story.

The deterministic salted join (`operators/skew.py`, oracle-checked via
join_salted_skew) is the compile-time mitigation for hot keys; this gate
proves the RUNTIME path also works in this engine build: with adaptive
skew-join enabled, a sort-merge join over a heavily skewed key gets its
skewed partition split (the final adaptive plan carries ``skew=true``),
so a 100 TB join with an unanticipated hot key self-heals without a
rewritten query."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # scaled-down thresholds so the local fixture's hot key (200k rows
        # on one key vs ~200 elsewhere) crosses the same relative bar a
        # production hot key would
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(0, 220000).select(
            F.when(F.col("id") < 200000, 0)
            .otherwise((F.col("id") % 100) + 1)
            .alias("k"),
            F.concat(
                F.lit("pad_"), F.col("id").cast("string"), F.lit("x" * 64)
            ).alias("payload"),
        )
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k").select("k", "payload", "d")
        assert len(j.collect()) == 220000  # semantics unchanged
        # the FINAL adaptive plan (after execution) must carry the split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert re.search(r"skew=true", plan), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
