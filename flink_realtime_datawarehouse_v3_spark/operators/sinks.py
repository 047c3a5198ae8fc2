"""DWS table sinks: date-partitioned parquet with pruning-friendly layout.

The reference writes DWS rows to ClickHouse tables whose primary key
leads with the window start (`stt`), giving the BI layer time-range scan
locality (RT/utils/MyClickHouseUtil.java:23-63). The lake equivalent is
directory partitioning on the window date: `dt=YYYY-MM-DD/part-*.parquet`.
A dashboard query for one day then reads one directory — at 100 TB the
difference between a partition-pruned scan and a full-table scan is the
whole query.

``write_dws`` also drops accumulator columns named in ``transient`` — the
`@TransientSink` contract (RT/bean/TransientSink.java:15, e.g. the
`orderIdSet` accumulator at RT/bean/TradeUserSpuOrderBean.java:42-46):
state that exists for the aggregation but must not reach the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_dws(
    df: DataFrame,
    path: str,
    stt_col: str = "stt",
    transient: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a DWS window result partitioned by the window-start date.

    The repartition on ``dt`` before the dynamic-partition write is the
    write-amplification guard: without it every one of N upstream tasks
    opens a writer in every date directory (N x |dt| tiny files — 22k for
    a 2-year window set at 32 tasks); with it each directory is written by
    exactly one task. At 100 TB this is the difference between a sink and
    a small-file incident.
    """
    out = df.drop(*(transient or []))
    out = out.withColumn("dt", F.to_date(F.col(stt_col)))
    out.repartition(F.col("dt")).write.mode(mode).partitionBy("dt").parquet(path)


def read_dws_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Read one day back; the `dt = day` filter must prune to a single
    partition directory (asserted by the plan test)."""
    return spark.read.parquet(path).filter(F.col("dt") == day)
