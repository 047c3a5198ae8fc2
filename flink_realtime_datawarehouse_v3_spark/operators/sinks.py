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


def list_part_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every ``part-*.parquet`` under ``path``, via the
    Hadoop FileSystem API — NOT local glob/os.path.getsize, so the same
    inventory works against s3a://, abfs://, hdfs:// and ``file:`` URIs
    (object stores have no local paths; at 100 TB the table lives there).
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise ValueError(f"list_part_files: no such path {path}")
    out: list[tuple[str, int]] = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isFile() and name.startswith("part-") and name.endswith(".parquet"):
            out.append((st.getPath().toString(), int(st.getLen())))
    return out


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
    import math

    files = list_part_files(spark, src)
    if not files:
        raise ValueError(f"compact_parquet: no part files under {src}")
    total = sum(size for _, size in files)
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src).repartition(n_out).write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)


def upsert_partitioned(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    part_col: str,
    key_col: str = "doc_id",
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
    keys = updates.select(key_col).distinct()
    # localCheckpoint materializes the merged partitions BEFORE the
    # overwrite touches base_path (Spark refuses a lazy plan that reads
    # the path it is overwriting).
    merged = (
        base.join(keys, key_col, "left_anti")
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


def write_shards(df: DataFrame, path: str) -> None:
    """Materialize packed training shards on disk: one JSONL file per
    ``shard_id`` directory — the product step after :func:`text_analysis.
    shard_pack` assigns shard ids, closing the loop from packing
    arithmetic to the on-disk shards a training loader mounts.

    The ``repartition(shard_id)`` before the dynamic-partition write is
    the same small-file guard as :func:`write_dws`: each shard directory
    is written by exactly ONE task (without it, N upstream tasks x
    |shards| directories of tiny files), and a loader then reads shard k
    as one directory containing one file — pinned by
    tests/test_training_ops.py::test_shard_sink_one_file_per_shard."""
    (
        df.repartition(F.col("shard_id"))
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .json(path)
    )


def _morton_interleave(a, b, bits: int = 21):
    """Morton (Z-order) code: interleave the low ``bits`` of two BIGINT
    columns — pure Catalyst shift/mask expressions, no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
) -> None:
    """Z-order data layout: range-partition + sort by the Morton code of
    (col_a, col_b), so parquet footer min/max stats stay TIGHT on BOTH
    columns at once — a point/range filter on either column then skips
    most files/row-groups at planning time. This is the multi-dimensional
    clustering a 100 TB fact table needs: a plain sort on col_a gives
    perfect skipping on col_a and none on col_b; Z-order splits the
    difference. Pure Catalyst morton expression, one range exchange.

    Both columns are min-max normalized to the 21-bit grid first (raw
    values interleave their LOW bits, which for e.g. epoch-millis are
    noise); the min/max pair is a 1-row bounded agg, collected like any
    index artifact."""
    lo_a, hi_a, lo_b, hi_b = (
        df.agg(
            F.min(F.col(col_a).cast("bigint")),
            F.max(F.col(col_a).cast("bigint")),
            F.min(F.col(col_b).cast("bigint")),
            F.max(F.col(col_b).cast("bigint")),
        ).first()
    )
    if lo_a is None or lo_b is None:
        raise ValueError("zorder_write: empty input (no min/max to normalize)")
    grid = (1 << 21) - 1

    def norm(c, lo, hi):
        # The scaled coordinate is computed in decimal(38,0): a BIGINT
        # (value - lo) * grid overflows int64 once the column span
        # exceeds ~2^63/2^21 ≈ 4.4e12 (e.g. epoch-micros), and the
        # ANSI-on session turns that overflow into a hard error.
        span = max(1, hi - lo)
        return F.expr(
            f"CAST((CAST({c} AS DECIMAL(38,0)) - {lo}) * {grid} DIV {span}"
            f" AS BIGINT)"
        )

    z = _morton_interleave(norm(col_a, lo_a, hi_a), norm(col_b, lo_b, hi_b))
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def _read_parquet_footer(spark: SparkSession, file_path: str, flen: int):
    """Parquet footer metadata via the Hadoop FileSystem API — two ranged
    reads (8-byte trailer, then the thrift footer), never the data pages,
    so the probe costs O(footer) per file even when the file lives on an
    object store. The footer bytes are rewrapped as a minimal in-memory
    parquet file (magic + footer + trailer) for pyarrow to parse — footer
    parsing never dereferences data-page offsets."""
    import io
    import struct

    import pyarrow.parquet as pq

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(file_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def ranged_read(pos: int, n: int) -> bytes:
        # seek + bounded toByteArray: the returned Java byte[] crosses
        # the py4j bridge as Python bytes (an ARGUMENT array would be
        # copied by value and never see the Java-side write).
        stream = fs.open(jpath)
        try:
            stream.seek(pos)
            out = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream, n))
            if len(out) != n:
                raise EOFError(f"short read at {pos}+{n} in {file_path}")
            return out
        finally:
            stream.close()

    trailer = ranged_read(flen - 8, 8)
    if trailer[4:] != b"PAR1":
        raise ValueError(f"not a parquet file: {file_path}")
    (footer_len,) = struct.unpack("<I", trailer[:4])
    footer = ranged_read(flen - 8 - footer_len, footer_len)
    return pq.ParquetFile(io.BytesIO(b"PAR1" + footer + trailer)).metadata


def files_containing(
    spark: SparkSession, path: str, col: str, value
) -> tuple[int, int]:
    """(candidate_files, total_files): how many part files' footer
    min/max for ``col`` admit ``value`` — the driver-side metadata probe
    behind data skipping (what the scan planner consults).

    Inventory and footer reads both go through the Hadoop FileSystem API
    (the :func:`list_part_files` posture), so the same probe works
    against s3a:// / abfs:// / hdfs:// URIs — no local glob."""
    total = cand = 0
    for fpath, flen in list_part_files(spark, path):
        total += 1
        md = _read_parquet_footer(spark, fpath, flen)
        idx = md.schema.names.index(col)
        hit = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max or (st.min <= value <= st.max):
                hit = True
                break
        cand += hit
    return cand, total
