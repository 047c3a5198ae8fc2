"""Streaming harness: finite-input replay + availableNow runners.

The reference's jobs consume unbounded Kafka topics; the driver's data is
finite parquet. The replay harness makes a faithful finite stream out of
any batch DataFrame:

- :func:`write_stream_input` materializes a batch DataFrame as ``n_files``
  time-ordered parquet files;
- :func:`read_stream` re-reads them with ``maxFilesPerTrigger=1``, so each
  file becomes its own micro-batch — state, watermarks and timers advance
  across real micro-batch boundaries exactly as they would on Kafka;
- a ``sentinel`` row far past the last event time can be appended as the
  final file, advancing the watermark so that closing windows / timers
  flush before ``availableNow`` terminates (Flink's job-end watermark+Long.MAX
  flush does the same on bounded input).

Runners execute a streaming DataFrame to a memory sink or through
``foreachBatch`` and block until completion.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_stream_input(
    df: DataFrame, path: str, n_files: int = 4, order_by: list[str] | None = None
) -> str:
    """Materialize ``df`` as ``n_files`` parquet files under ``path``.

    With ``order_by`` (typically the event-time column) rows are range-split
    into time-contiguous files, so replaying file-per-batch preserves
    coarse event-time order across batches — the Kafka-ish arrival pattern
    the reference's state TTLs assume.

    The file-stream source orders files by MODIFICATION TIME, which for a
    parallel parquet write is task-completion order — effectively random
    (caught in round 9: a 4-file replay fed batches last-range-first, so
    a day-ordered stateful op saw day regressions at every boundary).
    Each part file's mtime is therefore re-stamped strictly increasing in
    range order, pinning batch order == event-time order.
    """
    if order_by:
        df = df.repartitionByRange(n_files, *[F.col(c) for c in order_by])
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(path)
    stamp_file_order(path)
    return path


def stamp_file_order(path: str, extra_files: list[str] | None = None) -> None:
    """Give the directory's part files strictly increasing mtimes in name
    order (then ``extra_files``, e.g. sentinel batches, after them). The
    file-stream source picks files up in (mtime, path) order and a
    parallel write finishes tasks in RANDOM order, so without the
    re-stamp a replay can feed batches last-range-first — the round-9
    batch-order bug. One shared implementation: the replay harness in
    pipelines.py and :func:`write_stream_input` both call this."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(path, "part-*.parquet")))
    files.extend(extra_files or [])
    base = 1_600_000_000  # fixed epoch: deterministic across runs
    for i, f in enumerate(files):
        os.utime(f, (base + i * 10, base + i * 10))


def read_stream(
    spark: SparkSession, path: str, schema=None, files_per_trigger: int | None = None
) -> DataFrame:
    """Re-read a :func:`write_stream_input` directory as a file stream, one
    micro-batch per ``files_per_trigger`` files.

    ``files_per_trigger=None`` (default) honors the ``_replay_meta.json``
    marker the parallel replay writer leaves beside the part files (the
    writer decides the trigger chunking that reproduces its intended
    micro-batch boundaries — see ``pipelines._write_replay``), falling
    back to the classic one-file-per-batch replay."""
    if files_per_trigger is None:
        meta = os.path.join(path, "_replay_meta.json")
        files_per_trigger = 1
        if os.path.exists(meta):
            import json

            with open(meta) as f:
                files_per_trigger = int(json.load(f)["files_per_trigger"])
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


class _StreamShufflePartitions:
    """Temporarily lower ``spark.sql.shuffle.partitions`` while a streaming
    query is planned/started.

    The number of state-store instances per stateful operator equals the
    shuffle-partition count frozen at query start; at test scale 32
    partitions x N join operators is pure per-micro-batch overhead (each
    instance snapshots to the checkpoint dir every batch).  8 keeps the
    multi-partition code path honest while making multi-operator replays
    run in seconds.  Batch queries planned after restore are unaffected.
    """

    def __init__(self, spark: SparkSession, n: int = 8):
        self.spark = spark
        self.n = n
        self.saved: str | None = None

    def __enter__(self):
        self.saved = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.saved)


def _await_or_raise(q, timeout_s: int) -> None:
    """Block until the availableNow query finishes; raise on timeout.

    Silently stopping an unfinished availableNow query truncates the
    output mid-stream (the final watermark-flush batches never run, losing
    exactly the rows nearest the stream's end), so a timeout must be loud.
    """
    try:
        finished = q.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"streaming query did not finish within {timeout_s}s; "
                "output would be truncated mid-stream"
            )
    finally:
        q.stop()


def run_to_memory(
    sdf: DataFrame,
    output_mode: str = "append",
    timeout_s: int = 600,
    n_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; return the sink contents as a batch DataFrame.

    ``n_partitions`` overrides the low replay default (8): the default
    minimizes per-batch state-store snapshot overhead for MULTI-operator
    join replays, but a single stateful operator whose per-key work runs
    in Python (applyInPandasWithState) is bottlenecked on Python-side
    CPU, which parallelizes exactly as wide as the state partitioning —
    there, match the partition count to the cores (r12: the debounce
    replay dropped ~3x by not starving 32 cores with 8 partitions)."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    with _StreamShufflePartitions(
        sdf.sparkSession, **({"n": n_partitions} if n_partitions else {})
    ):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    _await_or_raise(q, timeout_s)
    if n_partitions:
        _unload_state_store_providers(sdf.sparkSession)
    return sdf.sparkSession.table(name)


def _unload_state_store_providers(spark) -> None:
    """Synchronously unload every cached state-store provider.

    A WIDENED replay (n_partitions at the core count) leaves that many
    RocksDB provider instances — native memory + background threads —
    in the executor's provider cache after the query terminates; the
    asynchronous maintenance task only evicts them on its next tick, so
    the replays that follow in a bench lane pay the overhang (r12
    freeze: untouched 8-partition entries after the widened debounce
    read up to 2x slower). Safe between replays: every replay uses a
    fresh checkpoint dir, so nothing reuses a dropped provider — the
    next query lazily reloads its own. Scoped to WIDENED runs only: an
    r12 A/B of unloading after EVERY replay read 229.3 s vs 216.7 s
    over the seven heaviest lane entries (the maintenance-pool restart
    and cold provider caches cost multi-operator replays more than the
    overhang saves)."""
    getattr(
        getattr(
            spark._jvm,
            "org.apache.spark.sql.execution.streaming.state.StateStore$",
        ),
        "MODULE$",
    ).stop()


def run_foreach_batch(
    sdf: DataFrame, fn: Callable[[DataFrame, int], None], timeout_s: int = 600
) -> None:
    """Run a streaming DataFrame through ``foreachBatch(fn)`` to completion."""
    with _StreamShufflePartitions(sdf.sparkSession):
        q = (
            sdf.writeStream.foreachBatch(fn)
            .trigger(availableNow=True)
            .start()
        )
    _await_or_raise(q, timeout_s)


class TempStreamDir:
    """Context manager for a throwaway checkpoint/input directory."""

    def __init__(self, prefix: str = "spark_stream_"):
        self.path = tempfile.mkdtemp(prefix=prefix)

    def sub(self, name: str) -> str:
        return os.path.join(self.path, name)

    def __enter__(self) -> "TempStreamDir":
        return self

    def __exit__(self, *exc) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
