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


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
) -> DataFrame:
    """Size-targeted small-file compaction — the table-maintenance job
    every parquet lake runs. Output file count = ceil(on-disk bytes /
    ``target_bytes``), derived from the SOURCE's file sizes (a driver-side
    metadata listing, not a data scan), so the rewrite emits
    ~``target_bytes`` files regardless of how fragmented ingestion left
    the table. One round-robin repartition is the whole job; at 100 TB
    this runs per-partition-directory with the same arithmetic.

    Returns the compacted table re-read from ``dst``.
    """
    import glob
    import math
    import os

    files = glob.glob(os.path.join(src, "part-*.parquet"))
    if not files:
        raise ValueError(f"compact_parquet: no part files under {src}")
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src).repartition(n_out).write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)


def upsert_partitioned(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    part_col: str,
) -> None:
    """Partition-scoped upsert WITHOUT a table format: merge ``updates``
    into the ``part_col``-partitioned parquet table at ``base_path``,
    rewriting ONLY the partition directories the updates touch (Spark's
    dynamic partitionOverwriteMode) — the standard pre-Delta lakehouse
    MERGE. The merged content for each affected partition is
    anti-join(base, updates) + updates; untouched partitions' files are
    never read or rewritten (asserted by the file-inventory pytest).

    At 100 TB the read side prunes to the affected partitions only — the
    merge cost tracks the update's partition footprint, not table size.
    """
    parts = [r[0] for r in updates.select(part_col).distinct().collect()]
    base = spark.read.parquet(base_path).filter(F.col(part_col).isin(parts))
    keys = updates.select("doc_id").distinct()
    # localCheckpoint materializes the merged partitions BEFORE the
    # overwrite touches base_path (Spark refuses a lazy plan that reads
    # the path it is overwriting).
    merged = (
        base.join(keys, "doc_id", "left_anti")
        .unionByName(updates)
        .localCheckpoint()
    )
    (
        merged.repartition(F.col(part_col))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part_col)
        .parquet(base_path)
    )
