"""End-to-end streaming runs of representative pipelines (stream==batch).

Each runner replays the synthesized topic through the file-stream harness
(:mod:`.core`), applies the pipeline under ``trigger(availableNow=True)``,
and returns the streamed result as a batch DataFrame for comparison against
the batch pipeline (tests/test_streaming.py).

Pipelines covered (one per SURVEY.md streaming mechanism):
- stateless DWD filter (P1/P3/P4)            -> stream_favor_add
- watermark + 10 s tumbling window agg (A1)  -> stream_keyword_window
- keyed-state UV dedup (D1/W4)               -> stream_unique_visitor
- keyed-state CEP bounce w/ timeout (D5/W10) -> stream_jump_detail
- keyed upsert sink (K3)                     -> stream_order_info_upsert
- checkpointed sink kill+resume (K2/W11)     -> stream_checkpoint_recovery
- broadcast-config DIM routing (J10/P6/K5)   -> stream_dim_app
- stream-stream join, inner + 2 bounded left
  + stream-static dic lookup (J1/J2/J3/W5)   -> stream_order_pre_process
- 3-way payment join over two independent
  streams (J5)                               -> stream_pay_detail_suc
- session windows (gap-merge, append mode)   -> stream_sessionize
- continuous 1-min rollup w/ min_by/max_by   -> stream_time_rollup
- hopping (sliding) windows, append mode     -> stream_hop_window
- incremental SCD2 history maintenance       -> stream_dim_coupon_scd2
- late-data discard, hash-gated (W12)        -> stream_keyword_window_late
- runtime schema evolution, config flip live -> stream_dim_user_info_evolve
- COMPLETE-mode running aggregation         -> stream_value_histogram
- stream-stream FULL OUTER join, banded     -> stream_activity_coupon_full_outer
- CJK dictionary-FMM segmenter in-window    -> stream_keyword_cjk_window
- COMPLETE-mode global ORDER BY / LIMIT     -> stream_type_counts_top
- ingestion-time dedup vs static base       -> stream_dedup_incremental
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize
from ..operators import timeseries
from ..operators.windows import rt_from_ms
from ..plans import dwd_simple
from ..sources import cdc, logs
from . import stateful
from .core import (
    TempStreamDir,
    read_stream,
    run_foreach_batch,
    run_to_memory,
    stamp_file_order,
)
from .dim_app import dim_router, read_dim_table

N_FILES = 4


def _topic_db_cached(spark: SparkSession, sf_dir: str, only: list[str]) -> DataFrame:
    """Structured topic rows for replay INPUT, served from the session's
    per-branch ODS parse cache (:func:`..sources.cdc.topic_db_parsed`).

    r13 optimization round (guide §1.2 "don't compute things twice"):
    replay writers previously re-derived ``cdc.topic_db`` from the base
    parquet per entry — and ``repartitionByRange``'s boundary-sampling
    pass re-computed that derivation a SECOND time before the write even
    started. The ODS cache already holds the identical rows (parsed,
    in-memory columnar, pre-warmed by bench.py's ods_warm loop — exactly
    the "topics already exist when the job starts" posture the batch lane
    uses). Row-identity: the builders emit only insert/update envelopes,
    and the ODS JSON round-trip is lossless for the envelope
    (``parse(to_json(x)) == x`` field-by-field); the parsed union's extra
    dirty branch is empty after the P1 filter."""
    return cdc.topic_db_parsed(spark, sf_dir, only=only)


# mtime-order stamping lives in core.stamp_file_order (shared with
# write_stream_input — ONE implementation of the batch-order invariant).
_stamp_file_order = stamp_file_order


def _max_from_footers(path: str, col: str) -> int:
    """Max of ``col`` over the part files just written under ``path``, read
    from the parquet row-group footer statistics — a driver-side metadata
    scan (a few KB per file), replacing the full-input ``agg(max).collect``
    Spark job each replay previously paid for its sentinel timestamps."""
    import pyarrow.parquet as pq

    mx = None
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                mx = st.max if mx is None else max(mx, st.max)
    if mx is None:
        raise ValueError(f"no footer statistics for column {col!r} under {path}")
    return mx


def _pad_empty_like(src_file: str, dest: str) -> None:
    """Write a ZERO-ROW parquet file with ``src_file``'s schema (a pyarrow
    footer-only write — no Spark job). Pads fill a sentinel's trigger
    chunk so the sentinel still gets a micro-batch of its own when the
    replay reads >1 file per trigger (see :func:`_write_replay`)."""
    import pyarrow.parquet as pq

    t = pq.ParquetFile(src_file).read()
    pq.write_table(t.slice(0, 0), dest)


def _write_replay(
    df: DataFrame,
    path: str,
    order_by: list[str] | None,
    sentinels=None,
    max_col: str | None = None,
    n_files: int = N_FILES,
) -> None:
    """Write ``df`` as ``n_files`` time-range MICRO-BATCH GROUPS of parquet
    files (+ optional sentinel rows, each as its own trailing micro-batch).

    Write parallelism (r13 optimization round, guide §2.6/§6): the batch
    count contract is ``n_files`` micro-batches, but writing exactly
    ``n_files`` part files pins the input-write job to that many tasks —
    measured 36.5 s of streaming_order_pre_process's 142 s at sf0.1 on
    local[32] with 2 write tasks. Instead the replay writes
    ``n_files * files_per_trigger`` range-contiguous files (full-width
    write job) and records ``files_per_trigger`` in a ``_replay_meta.json``
    marker that :func:`..core.read_stream` picks up, so each trigger
    consumes one contiguous range GROUP — identical batch boundaries in
    event time, identical batch count, wider write and scan. With
    ``SPARK_GRAFT_CPUS`` <= ``n_files`` (the driver's low-core scaling
    bench) this degrades to exactly the old one-file-per-batch layout.

    Two trailing sentinels are the bounded-input flush protocol: the
    watermark computed from sentinel k only takes effect in batch k+1, so
    the first sentinel's batch closes every real-data window/timer and the
    second's batch emits them before availableNow terminates. Each
    sentinel file is padded with zero-row files to a full trigger chunk so
    the chunked reader never merges two sentinels into one batch.

    ``sentinels`` is either a list of DataFrames or a callable
    ``max_value -> list[DataFrame]``; the callable form gets the max of
    ``max_col`` from the written files' footer stats, so sentinel
    construction costs no extra input scan.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    fpb = max(1, min(8, par // n_files))  # files per micro-batch group
    total = n_files * fpb
    if order_by:
        df = df.repartitionByRange(total, *[F.col(c) for c in order_by])
    else:
        df = df.repartition(total)
    df.write.mode("overwrite").parquet(path)
    if callable(sentinels):
        sentinels = sentinels(_max_from_footers(path, max_col))
    sent_files = []
    for i, sdf in enumerate(sentinels or []):
        tmp = f"{path}__sent{i}"
        # repartition(1), NOT coalesce(1): a coalesced single task over a
        # parallelized local relation inherits 32 parent preferred
        # locations and sits through the scheduler's locality-wait ladder
        # — measured 5.8 s PER 1-ROW SENTINEL vs 0.7 s through the
        # 1-partition shuffle (r13 optimization round, guide §7.4
        # "scheduler delay"). Two sentinels per replay made this ~11 s of
        # invisible per-entry overhead across the streaming lane.
        sdf.repartition(1).write.mode("overwrite").parquet(tmp)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dest = os.path.join(path, f"zzz-sentinel-{i}.parquet")
        os.replace(src, dest)
        sent_files.append(dest)
        for j in range(fpb - 1):
            pad = os.path.join(path, f"zzz-sentinel-{i}-pad{j}.parquet")
            _pad_empty_like(dest, pad)
            sent_files.append(pad)
    _stamp_file_order(path, sent_files)
    with open(os.path.join(path, "_replay_meta.json"), "w") as f:
        json.dump({"files_per_trigger": fpb}, f)


def stream_favor_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless DWD pipeline under streaming: raw JSON -> P1 parse ->
    favor-add filter/projection."""
    with TempStreamDir() as d:
        raw = cdc.topic_db_json(spark, sf_dir, only=["favor_info"])
        _write_replay(raw, d.sub("in"), order_by=None)
        stream = cdc.parse_topic_db(read_stream(spark, d.sub("in")))
        out = dwd_simple.dwd_interaction_favor_add(stream)
        return run_to_memory(out)


def _page_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-synthesized DWD page log (the stream input for DWS jobs —
    in production this is the dwd_traffic_page topic)."""
    from ..api import QUERIES

    return QUERIES["dwd_traffic_page_log"](spark, sf_dir)


SENTINEL_WORD = "zzsentinelflush"


def _page_sentinel(page: DataFrame, mx: int, hours: int = 1) -> DataFrame:
    """One synthetic heartbeat page event ``hours`` past ``mx`` (the
    stream's max event time, from the replay files' footer stats): pushes
    the watermark over every open window/timer (Flink's end-of-input
    Long.MAX watermark flush, for bounded replay).

    The row is shaped to SURVIVE the pipelines' filters (search page with a
    sentinel keyword): Catalyst pushes deterministic filters below the
    EventTimeWatermark operator, so a row that a filter drops never advances
    the watermark. Consumers drop the sentinel on the output side.
    """
    return (
        page.limit(1)
        .select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                if f.name not in ("ts", "mid", "event_id", "page_id")
                else F.col(f.name)
                for f in page.schema.fields
            ]
        )
        .withColumn("ts", F.lit(mx + hours * 3600 * 1000).cast("long"))
        .withColumn("mid", F.lit("__sentinel__"))
        .withColumn("page_id", F.lit("search"))
        .withColumn("item_type", F.lit("keyword"))
        .withColumn("item", F.lit(SENTINEL_WORD))
    )


def stream_keyword_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 as a native streaming windowed aggregation: watermark 2 s,
    10 s tumbling count per keyword (append mode — windows emit exactly
    once, on watermark passage)."""
    page = _page_log(spark, sf_dir)
    with TempStreamDir() as d:
        _write_replay(
            page,
            d.sub("in"),
            order_by=["ts"],
            sentinels=lambda mx: [
                _page_sentinel(page, mx, hours=1),
                _page_sentinel(page, mx, hours=2),
            ],
            max_col="ts",
        )
        s = read_stream(spark, d.sub("in"))
        s = s.withColumn("rt", rt_from_ms(F.col("ts"))).withWatermark("rt", "2 seconds")
        words = s.filter(
            (F.col("page_id") == "search")
            & (F.col("item_type") == "keyword")
            & F.col("item").isNotNull()
        ).select(F.explode(tokenize(F.col("item"))).alias("word"), "rt")
        agg = (
            words.groupBy(F.window("rt", "10 seconds").alias("w"), "word")
            .agg(F.count(F.lit(1)).alias("keyword_count"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
                F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
                F.lit("search").alias("source"),
                F.col("word").alias("keyword"),
                "keyword_count",
            )
        )
        return run_to_memory(agg, output_mode="append").filter(
            F.col("keyword") != SENTINEL_WORD
        )


def stream_keyword_cjk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+A1 with the dictionary-FMM CJK segmenter (an Arrow-batched
    Pandas UDF) running INSIDE the watermarked streaming window — proves
    the segmenter plug point holds under micro-batch execution, not just
    batch. Same replay/sentinel protocol as stream_keyword_window; the
    sentinel row keeps its latin marker token (a projection, not a
    filter, so it still advances the watermark) and is dropped on the
    output side."""
    from ..functions.tokenize import CJK_PHRASES, segment_cjk_pandas_udf

    page = _page_log(spark, sf_dir)
    with TempStreamDir() as d:
        _write_replay(
            page,
            d.sub("in"),
            order_by=["ts"],
            sentinels=lambda mx: [
                _page_sentinel(page, mx, hours=1),
                _page_sentinel(page, mx, hours=2),
            ],
            max_col="ts",
        )
        s = read_stream(spark, d.sub("in"))
        s = s.withColumn("rt", rt_from_ms(F.col("ts"))).withWatermark(
            "rt", "2 seconds"
        )
        phrases = F.array(*[F.lit(p) for p in CJK_PHRASES])
        toks = F.when(
            F.col("item") == SENTINEL_WORD, F.array(F.lit(SENTINEL_WORD))
        ).otherwise(
            segment_cjk_pandas_udf(
                F.element_at(
                    phrases,
                    (F.col("ts").cast("bigint") % len(CJK_PHRASES) + 1).cast(
                        "int"
                    ),
                )
            )
        )
        words = s.filter(
            (F.col("page_id") == "search")
            & (F.col("item_type") == "keyword")
            & F.col("item").isNotNull()
        ).select(F.explode(toks).alias("word"), "rt")
        agg = (
            words.groupBy(F.window("rt", "10 seconds").alias("w"), "word")
            .agg(F.count(F.lit(1)).alias("keyword_count"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
                F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
                F.lit("search").alias("source"),
                F.col("word").alias("keyword"),
                "keyword_count",
            )
        )
        return run_to_memory(agg, output_mode="append").filter(
            F.col("keyword") != SENTINEL_WORD
        )


def stream_unique_visitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 UV dedup with per-mid date state."""
    page = _page_log(spark, sf_dir)
    with TempStreamDir() as d:
        _write_replay(page, d.sub("in"), order_by=["ts"])
        s = (
            read_stream(spark, d.sub("in"))
            .filter(F.col("last_page_id").isNull())
            .withColumn(
                "dt", F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd")
            )
        )
        out = stateful.first_per_day_stream(s, key="mid", dt_col="dt")
        # r14: back to the 8-partition replay default. The r12 widening
        # existed because Python ran once per KEY per batch; the bucketed
        # operator runs once per BUCKET, so the per-batch cost is now the
        # stateful-stage floor (store open/commit x partitions) and fewer
        # partitions win: A/B wide-vs-8 at sf0.1 read 5.9 -> 4.2 s
        # min-of-3 (8 won all three interleaved pairs).
        return run_to_memory(out, output_mode="append").drop("dt")


def stream_jump_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 bounce detection with event-time timeout."""
    page = _page_log(spark, sf_dir)
    with TempStreamDir() as d:
        _write_replay(
            page,
            d.sub("in"),
            order_by=["ts"],
            sentinels=lambda mx: [
                _page_sentinel(page, mx, hours=1),
                _page_sentinel(page, mx, hours=2),
            ],
            max_col="ts",
        )
        s = read_stream(spark, d.sub("in")).withColumn("rt", rt_from_ms(F.col("ts")))
        out = stateful.jump_detect_stream(s).filter(F.col("mid") != "__sentinel__")
        # r14: back to the 8-partition replay default (see
        # stream_unique_visitor) — per-batch decomposition showed a
        # ~1.2 s stateful-stage floor per batch at 32 partitions once
        # bucketing removed the per-key Python cost; A/B wide-vs-8 at
        # sf0.1 read 11.8 -> 9.2 s min-of-3 (8 won all three pairs).
        return run_to_memory(out, output_mode="append")


def stream_traffic_union_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-stream union window job (A2/A4 + O1 + W1's 14 s watermark,
    RT/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:60-185) with
    CHAINED stateful operators: one replayed page stream fans into the
    raw page branch, a D1 first-per-day UV branch
    (applyInPandasWithState), and a D5 bounce branch (event-time
    timeout); the shaped union flows through a single 14 s watermark into
    a keyed 10 s tumbling window (second stateful layer).

    Sentinel rows must reach every watermark node, so they are NOT
    filtered pre-union (a mid filter would be pushed below the
    EventTimeWatermark and starve it); their all-null (vc, ch, ar,
    is_new) key is dropped from the aggregated output instead. Bounce
    timeout emissions are never late to the window layer: a bounce at
    event time T flushes once the watermark passes T+10 s, while its
    window only closes at window_end + 14 s > T + 14 s. Spark allows a
    single applyInPandasWithState per query, so the UV and bounce state
    machines run as ONE keyed operator emitting pre-shaped contribution
    rows (stateful.uv_jump_contrib_stream).
    """
    from ..operators.windows import stt_edt, tumble

    page = _page_log(spark, sf_dir)
    keys = ["vc", "ch", "ar", "is_new"]

    with TempStreamDir() as d:
        _write_replay(
            page,
            d.sub("in"),
            order_by=["ts"],
            sentinels=lambda mx: [
                _page_sentinel(page, mx, hours=1),
                _page_sentinel(page, mx, hours=2),
            ],
            max_col="ts",
        )
        s = read_stream(spark, d.sub("in"))
        stateful_in = s.withColumn("rt", rt_from_ms(F.col("ts"))).withColumn(
            "dt", F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd")
        )
        contrib = stateful.uv_jump_contrib_stream(stateful_in)
        page_shaped = s.select(
            *keys,
            F.col("ts"),
            F.lit(0).cast("long").alias("uv"),
            F.when(F.col("last_page_id").isNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("sv"),
            F.lit(1).cast("long").alias("pv"),
            F.col("during_time").cast("long").alias("dur"),
            F.lit(0).cast("long").alias("uj"),
        )
        unioned = (
            page_shaped.unionByName(contrib)
            .withColumn("rt", rt_from_ms(F.col("ts")))
            .drop("ts")
            .withWatermark("rt", "14 seconds")
        )
        # Spark's static checker rejects ANY stateful op above another
        # stateful op that can emit watermark-old rows. Here the pattern
        # is provably safe: a bounce at event time T is flushed when the
        # watermark passes T + 10 s (the CEP timeout), while its target
        # window only closes at window_end + 14 s >= T + 14 s — every
        # timeout emission lands 4+ s before its window's cutoff. Disable
        # the check for this query only (documented Spark escape hatch).
        chk = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
        saved = spark.conf.get(chk)
        spark.conf.set(chk, "false")
        # With the check disabled Spark still WARN-logs the full analyzed
        # plan + AnalysisException text from UnsupportedOperationChecker
        # at every query start — pure noise once the safety argument
        # above holds, and it pollutes committed sweep logs (r11 verdict
        # cosmetic #2). Quiet exactly that logger for the run.
        _uoc = "org.apache.spark.sql.catalyst.analysis.UnsupportedOperationChecker"
        _jvm = spark._jvm
        _saved_lvl = _jvm.org.apache.logging.log4j.LogManager.getLogger(
            _uoc
        ).getLevel()
        _jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            _uoc, _jvm.org.apache.logging.log4j.Level.ERROR
        )
        try:
            agg = (
                tumble(unioned, F.col("rt"), *keys)
                .agg(
                    F.sum("uv").alias("uv_ct"),
                    F.sum("sv").alias("sv_ct"),
                    F.sum("pv").alias("pv_ct"),
                    F.sum("dur").alias("dur_sum"),
                    F.sum("uj").alias("uj_ct"),
                )
                .select(
                    *stt_edt(), *keys,
                    "uv_ct", "sv_ct", "pv_ct", "dur_sum", "uj_ct",
                )
            )
            out = run_to_memory(agg, output_mode="append")
        finally:
            spark.conf.set(chk, saved)
            _jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                _uoc, _saved_lvl
            )
        return out.filter(F.col("vc").isNotNull())


def stream_order_info_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 keyed upsert sink: order_info changelog MERGEd to one row per id
    (last writer wins)."""
    with TempStreamDir() as d:
        structured = _topic_db_cached(spark, sf_dir, ["order_info"])
        flat = structured.select(
            F.col("data").getItem("id").alias("id"),
            F.col("data").getItem("order_status").alias("order_status"),
            F.col("data").getItem("operate_time").alias("operate_time"),
            F.col("ts").cast("long").alias("ts"),
        )
        _write_replay(flat, d.sub("in"), order_by=["ts"])
        s = read_stream(spark, d.sub("in"))
        out_path = d.sub("sink")
        run_foreach_batch(s, stateful.upsert_sink(["id"], "ts", out_path))
        return stateful.read_upsert_table(spark, out_path).localCheckpoint()


def stream_order_info_upsert_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """K3 keyed upsert through the SNAPSHOT-ISOLATED sink (atomic
    manifest-swap commit; see :func:`..streaming.stateful.
    upsert_sink_snapshot`): same changelog, same MERGE semantics, same
    oracle as :func:`stream_order_info_upsert` — the entry proves the
    MVCC commit protocol preserves last-writer-wins row-for-row across
    a multi-batch replay."""
    import os

    with TempStreamDir() as d:
        structured = _topic_db_cached(spark, sf_dir, ["order_info"])
        flat = structured.select(
            F.col("data").getItem("id").alias("id"),
            F.col("data").getItem("order_status").alias("order_status"),
            F.col("data").getItem("operate_time").alias("operate_time"),
            F.col("ts").cast("long").alias("ts"),
        )
        _write_replay(flat, d.sub("in"), order_by=["ts"])
        s = read_stream(spark, d.sub("in"))
        out_path = d.sub("snap_sink")
        os.makedirs(out_path, exist_ok=True)
        run_foreach_batch(
            s, stateful.upsert_sink_snapshot(["id"], "ts", out_path)
        )
        return stateful.read_upsert_snapshot(spark, out_path).localCheckpoint()


_PRE_TABLES = [
    "order_detail",
    "order_info",
    "order_detail_activity",
    "order_detail_coupon",
]


def _pre_sentinel(spark: SparkSession, ts: int) -> DataFrame:
    """One structured CDC row per order_pre_process branch at event time
    ``ts``: each passes its branch filter (so its watermark operator sees
    it — Catalyst pushes the deterministic table/type filters below the
    EventTimeWatermark node) but joins nothing (keys are unmatched
    sentinels), so the output needs no scrubbing."""

    def row(table: str, data: dict) -> tuple:
        return ("gmall_0105", table, "insert", data, None, str(ts), ts)

    rows = [
        # source_type must be NON-NULL: the inner base_dic join makes
        # Catalyst infer isnotnull(source_type) and push it below the od
        # branch's EventTimeWatermark, so a null-source_type sentinel would
        # never advance that branch's watermark (and the global min-policy
        # watermark would stall at end-of-data, leaving final state
        # unflushed). An unmatched code keeps it out of the inner-join
        # output.
        row(
            "order_detail",
            {"id": "sent_od", "order_id": "sent_od_order", "source_type": "sent_code"},
        ),
        row("order_info", {"id": "sent_oi"}),
        row("order_detail_activity", {"id": "sent_oa", "order_detail_id": "sent_oa_od"}),
        row("order_detail_coupon", {"id": "sent_oc", "order_detail_id": "sent_oc_od"}),
    ]
    return spark.createDataFrame(
        rows,
        "database string, `table` string, type string, "
        "data map<string,string>, old map<string,string>, ts string, "
        "__order long",
    )


def stream_order_pre_process(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 under Structured Streaming: the flagship 5-table wide-row job
    (RT/app/dwd/DwdTradeOrderPreProcess.java) as a genuine stream-stream
    join — four branches of one replayed topic_db stream, watermarked
    per-branch; inner od x oi join (unbounded state, declared changelog
    semantics); two LEFT joins with the +/- 5 s event-time bound standing
    in for the reference's 5 s idle-state TTL (W5); stream-static
    broadcast base_dic join (J3). Unmatched left rows flush when the
    trailing sentinels push every branch watermark past end-of-input.

    The replay carries STRUCTURED topic rows (like stream_dim_app): the
    4-branch join plan scans its source once per branch, so a JSON replay
    would re-parse every micro-batch 4x for no coverage gain — the
    P1 JSON-parse-under-streaming path is asserted by stream_favor_add
    and stream_base_log. (The reference's 4 Kafka consumers equally
    re-read the serialized topic; parse placement is an engine detail,
    not query semantics.)"""
    from ..plans import dwd_trade
    from ..sources import dic

    with TempStreamDir() as d:
        structured = _topic_db_cached(spark, sf_dir, _PRE_TABLES).withColumn(
            "__order", F.col("ts").cast("long")
        )
        # n_files=2: fewer real-data micro-batches for the heaviest
        # replay. Measured effect is modest (input write + join-state work
        # dominate, ~37 s either way at sf0.01) but semantics are
        # unaffected — flush order is driven by the trailing sentinels,
        # not by how many files carry the real rows.
        _write_replay(
            structured,
            d.sub("in"),
            order_by=["__order"],
            sentinels=lambda mx: [
                _pre_sentinel(spark, mx + 3600),
                _pre_sentinel(spark, mx + 7200),
            ],
            max_col="__order",
            n_files=2,
        )
        s = read_stream(spark, d.sub("in")).drop("__order")
        out = dwd_trade.order_pre_process(s, dic.base_dic(spark), event_time=True)
        return run_to_memory(out, output_mode="append")


_PAGE_FIELDS = ["page_id", "last_page_id", "item", "item_type", "during_time"]


def stream_base_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry point A (BaseLogApp, RT/app/dwd/BaseLogApp.java:49-195) under
    streaming: raw log JSON replay -> P2 parse/dirty-drop -> P8 per-mid
    is_new repair via applyInPandasWithState -> page-branch split (P7).

    The repair runs over ALL events (start events included) BEFORE the
    split, exactly like the reference's keyBy(mid) stage — filtering to
    the page branch first would change which event fixes the per-mid
    first-visit state. The stateful frame is flattened to scalar columns
    (structs don't round-trip through the Arrow state channel); the page
    struct fields ride along as nullable scalars.
    """
    from ..plans.dwd_traffic import _COMMON

    with TempStreamDir() as d:
        raw = logs.topic_log_json_cached(spark, sf_dir).select(
            "value",
            F.coalesce(
                F.get_json_object("value", "$.ts").cast("long"), F.lit(0)
            ).alias("__order"),
        )
        _write_replay(raw, d.sub("in"), order_by=["__order"])
        parsed = logs.parse_topic_log(
            read_stream(spark, d.sub("in")).select("value")
        )
        flat = parsed.select(
            "event_id",
            "ts",
            *[F.col(f"common.{c}").alias(c) for c in _COMMON],
            F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd").alias("dt"),
            F.col("start").isNotNull().alias("is_start"),
            *[F.col(f"page.{p}").alias(p) for p in _PAGE_FIELDS],
        )
        repaired = stateful.is_new_repair_stream(flat, key="mid", dt_col="dt")
        page = repaired.filter(~F.col("is_start")).select(
            *_COMMON, "event_id", "ts", *_PAGE_FIELDS
        )
        return run_to_memory(page, output_mode="append")


def stream_pay_detail_suc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 under Structured Streaming: payment_info CDC stream x the
    MATERIALIZED dwd_trade_order_detail stream x broadcast base_dic
    (RT/app/dwd/DwdTradePayDetailSuc.java:39,90-119).

    Two genuinely independent replayed file streams (the reference
    consumes the upstream job's Kafka topic dwd_trade_order_detail_0105 —
    here its batch-computed parquet replay stands in for that topic).

    The reference bounds join state with a 905 s PROCESSING-time idle TTL
    sized for the 15-min payment SLA — an arrival-proximity assumption
    that only holds live. On event-time replay, payment (order date
    + 30 min) and detail rows (ship date, days later) are far apart, so
    a 905 s event-time bound would drop nearly every match the job is
    meant to produce. As with the order pre-process inner join, state is
    kept unbounded: the declared join semantics rather than the TTL's
    accidental-loss behavior; batch==stream parity is the test.
    """
    from ..api import QUERIES
    from ..plans import dwd_trade
    from ..sources import dic

    with TempStreamDir() as d:
        od_batch = QUERIES["dwd_trade_order_detail"](spark, sf_dir)
        _write_replay(od_batch, d.sub("od"), order_by=["create_time"])
        pi_raw = _topic_db_cached(spark, sf_dir, ["payment_info"]).select(
            F.to_json(
                F.struct("database", "table", "type", "data", "old", "ts")
            ).alias("value")
        )
        _write_replay(pi_raw, d.sub("pi"), order_by=None)
        od_stream = read_stream(spark, d.sub("od"))
        pi_stream = cdc.parse_topic_db(read_stream(spark, d.sub("pi")))
        out = dwd_trade.pay_detail_suc(pi_stream, od_stream, dic.base_dic(spark))
        return run_to_memory(out, output_mode="append")


def stream_order_info_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/W6 keep-latest with processing-time debounce timer
    (RT/app/dws/DwsTradePaymentSucWindow.java:85-121): order_info CDC
    replay -> buffer best row per id in keyed state -> emit on timer.

    A key whose updates are further apart than the 5 s debounce emits
    once per burst — exactly the reference's behavior when events arrive
    slower than its timer (downstream jobs re-deduplicate). The parity
    test collapses emissions with the batch keep-latest operator.
    Trailing sentinels push the watermark past the last anchor + 5 s so
    every open timer fires before availableNow terminates; their key is
    filtered here.
    """
    from .stateful import keep_latest_stream

    with TempStreamDir() as d:
        flat = _topic_db_cached(spark, sf_dir, ["order_info"]).select(
            F.col("data").getItem("id").alias("id"),
            F.col("data").getItem("order_status").alias("order_status"),
            F.col("data").getItem("operate_time").alias("operate_time"),
            F.col("ts").cast("long").alias("ts"),
        )
        def sents(mx: int) -> list:
            return [
                spark.createDataFrame(
                    [("__sentinel__", None, None, mx + dt)],
                    "id string, order_status string, operate_time string, ts long",
                )
                for dt in (3600, 7200)
            ]

        # n_files=2 (see stream_order_pre_process; same modest effect):
        # emission grouping per batch varies by design and the parity
        # collapses it; the timer flush rides the sentinels.
        _write_replay(
            flat, d.sub("in"), order_by=["ts"], sentinels=sents,
            max_col="ts", n_files=2,
        )
        s = read_stream(spark, d.sub("in")).withColumn(
            "rt", F.to_timestamp(F.from_unixtime("ts"))
        )
        out = keep_latest_stream(s, keys=["id"], order_col="ts").filter(
            F.col("id") != "__sentinel__"
        )
        # r14: back to the 8-partition replay default. The r12 widening
        # (156.7 -> 58.0 s then) compensated for one Python call per
        # order id per batch; the bucketed operator makes Python cheap
        # and the A/B now reads wide 10.2 vs 8-partition 9.7 s min-of-3
        # (a wash) — the default also skips the widened-replay
        # state-store-provider unload the following entries paid for.
        return run_to_memory(out, output_mode="append")


def stream_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/W11 as a driver-checked round trip: run the favor-add DWD
    pipeline through a CHECKPOINTED parquet sink, kill the query after its
    first committed micro-batch (mid-stream crash), restart from the same
    checkpoint, and return the sink contents — offset tracking + idempotent
    batch writes must leave every row exactly once, so the recovered sink
    hashes against the ordinary batch oracle.

    The Structured Streaming equivalent of the reference's
    transactional-Kafka + checkpoint config (RT/utils/MyKafkaUtil.java:61-73,
    RT/app/dim/DimApp.java:36-45). If the first run drains all batches
    before the kill lands, the restart is a no-op and the result is
    unchanged — the kill timing affects which code path proves the
    guarantee, never the output.
    """
    import time

    with TempStreamDir() as d:
        raw = cdc.topic_db_json(spark, sf_dir, only=["favor_info"])
        _write_replay(raw, d.sub("in"), order_by=None)
        ckpt, sink = d.sub("ckpt"), d.sub("sink")

        def start():
            s = cdc.parse_topic_db(read_stream(spark, d.sub("in")))
            out = dwd_simple.dwd_interaction_favor_add(s)
            return (
                out.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        q = start()
        for _ in range(400):
            time.sleep(0.25)
            p = q.lastProgress
            if p is not None and p["batchId"] >= 1:
                break
        q.stop()
        q.awaitTermination(60)
        q2 = start()
        if not q2.awaitTermination(300):
            q2.stop()
            raise TimeoutError("checkpoint recovery run did not finish")
        return spark.read.parquet(sink).localCheckpoint()


def stream_dim_app(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """J10 config-routed DIM layer: replay the full topic, route per batch,
    MERGE into per-dim parquet tables; returns the final dim tables."""
    from ..plans.dim import DIM_CONFIG

    with TempStreamDir() as d:
        # Structured topic rows, time-range split so arrival order == CDC
        # order across micro-batches (the JSON parse path is exercised by
        # stream_favor_add; ts is a fixed-width epoch-seconds string, so
        # string range-partitioning preserves numeric order).
        structured = _topic_db_cached(
            spark, sf_dir, [c.source_table for c in DIM_CONFIG]
        )
        _write_replay(structured, d.sub("in"), order_by=["ts"])
        s = read_stream(spark, d.sub("in"))
        out_dir = d.sub("dims")
        run_foreach_batch(s, dim_router(out_dir))
        return {
            cfg.sink_table: read_dim_table(
                spark, out_dir, cfg.sink_table
            ).localCheckpoint()
            for cfg in DIM_CONFIG
        }


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows under streaming: watermarked native
    ``session_window`` gap-merge in append mode — each (user, session)
    emits exactly once, when the watermark passes its close (last event
    + gap). The tumbling windows cover W1-W3; this is the other
    first-class Flink window type (EventTimeSessionWindows.withGap) under
    Spark's native operator, replayed file-per-micro-batch so sessions
    MERGE across micro-batches (a session spanning two files is held in
    state until the gap expires, then emitted once).

    Sentinels: two heartbeat rows 1 h / 2 h past max event time (> GAP)
    close and flush every real session before availableNow terminates;
    their synthetic user is dropped on the output side.
    """
    from ..operators.sessionize import session_agg
    from ..sources import tables

    # Epoch-ms longs in the replay files (Spark parquet timestamps are
    # int96 — no footer min/max for the sentinel derivation); re-typed to
    # timestamp after the streaming read.
    e = tables.load(spark, sf_dir, "events").select(
        "user_id", F.unix_millis(F.col("ts")).alias("ts_ms"), "value"
    )
    with TempStreamDir() as d:
        def sents(mx: int) -> list:
            return [
                spark.createDataFrame(
                    [(-1, mx + h * 3_600_000, 0.0)],
                    "user_id long, ts_ms long, value double",
                )
                for h in (1, 2)
            ]

        _write_replay(e, d.sub("in"), order_by=["ts_ms"], sentinels=sents, max_col="ts_ms")
        s = (
            read_stream(spark, d.sub("in"))
            .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
            .drop("ts_ms")
            .withWatermark("ts", "2 seconds")
        )
        # Sentinel drop must happen on the MATERIALIZED output: a
        # grouping-key filter inside the streaming plan is pushed below
        # EventTimeWatermark and would silently eat the sentinels (same
        # constraint as _page_sentinel).
        return run_to_memory(session_agg(s), output_mode="append").filter(
            F.col("user_id") != -1
        )


def stream_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable-style continuous aggregate as a LIVE streaming
    query: watermarked 1-minute tumbling windows per user in append mode,
    with first/last via min_by/max_by inside the streaming agg — i.e. the
    materialized-rollup job a time-series warehouse runs continuously,
    emitting each (user, bucket) exactly once on watermark passage.

    Shares the batch oracle of ``events_time_rollup`` (window.start ==
    the arithmetic bucket, both epoch-aligned). Sentinels: two heartbeat
    rows 1 h / 2 h past max event time advance the watermark so every
    real bucket flushes before availableNow terminates; the synthetic
    user is dropped on the materialized output (a grouping-key filter
    inside the plan would be pushed below EventTimeWatermark and eat the
    sentinels — same constraint as stream_sessionize).
    """
    from ..sources import tables

    e = tables.load(spark, sf_dir, "events").select(
        "user_id", F.unix_millis(F.col("ts")).alias("ts_ms"), "value"
    )
    with TempStreamDir() as d:
        def sents(mx: int) -> list:
            return [
                spark.createDataFrame(
                    [(-1, mx + h * 3_600_000, 0.0)],
                    "user_id long, ts_ms long, value double",
                )
                for h in (1, 2)
            ]

        _write_replay(e, d.sub("in"), order_by=["ts_ms"], sentinels=sents, max_col="ts_ms")
        s = (
            read_stream(spark, d.sub("in"))
            .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
            .drop("ts_ms")
            .withWatermark("ts", "2 seconds")
        )
        agg = (
            s.groupBy(F.window("ts", "1 minute").alias("w"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("value_sum"),
                F.min_by("value", "ts").alias("first_value"),
                F.max_by("value", "ts").alias("last_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
            .select(
                "user_id",
                F.unix_millis(F.col("w.start")).alias("bucket_ms"),
                "n_events",
                "value_sum",
                "first_value",
                "last_value",
                "min_value",
                "max_value",
            )
        )
        return run_to_memory(agg, output_mode="append").filter(
            F.col("user_id") != -1
        )


def stream_hop_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows live: watermarked 10-min windows sliding
    by 5 min per event_type, append mode — each pane emits exactly once on
    watermark passage, and every event lands in window/slide = 2 panes.
    Shares the batch oracle of ``events_hop_window``.

    Sentinels: two heartbeat rows (event_type ``__sentinel__``) 1 h / 2 h
    past max event time flush every open pane before availableNow
    terminates; dropped on the materialized output (not inside the plan —
    a pre-watermark filter would eat them, same constraint as
    stream_sessionize)."""
    from ..sources import tables

    e = tables.load(spark, sf_dir, "events").select(
        "event_type", F.unix_millis(F.col("ts")).alias("ts_ms"), "value"
    )
    with TempStreamDir() as d:
        def sents(mx: int) -> list:
            return [
                spark.createDataFrame(
                    [("__sentinel__", mx + h * 3_600_000, 0.0)],
                    "event_type string, ts_ms long, value double",
                )
                for h in (1, 2)
            ]

        _write_replay(e, d.sub("in"), order_by=["ts_ms"], sentinels=sents, max_col="ts_ms")
        s = (
            read_stream(spark, d.sub("in"))
            .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
            .drop("ts_ms")
            .withWatermark("ts", "2 seconds")
        )
        agg = (
            s.groupBy(
                F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("value_sum"),
            )
            .select(
                "event_type",
                F.unix_millis(F.col("w.start")).alias("ws_ms"),
                "n_events",
                "value_sum",
            )
        )
        return run_to_memory(agg, output_mode="append").filter(
            F.col("event_type") != "__sentinel__"
        )


def stream_dim_coupon_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history maintained LIVE: replay the coupon_use CDC topic and
    per micro-batch append the batch's versions + re-derive intervals for
    the touched keys only (streaming/dim_app.py scd2_sink). The final
    table must equal the batch scd2_history — i.e. the oracle of
    ``dim_coupon_use_scd2`` — proving the incremental maintenance
    converges to the one-shot window computation."""
    from ..plans.dim import DIM_CONFIG
    from .dim_app import scd2_sink

    cfg = DIM_CONFIG[1]
    with TempStreamDir() as d:
        structured = _topic_db_cached(spark, sf_dir, [cfg.source_table])
        _write_replay(structured, d.sub("in"), order_by=["ts"])
        s = read_stream(spark, d.sub("in"))
        out_dir = d.sub("dims")
        run_foreach_batch(s, scd2_sink(out_dir, cfg))
        return (
            spark.read.parquet(os.path.join(out_dir, cfg.sink_table + "_scd2"))
            .drop("__bucket")
            .localCheckpoint()
        )


def stream_keyword_window_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12 on the driver board: the keyword window replay with LATE
    duplicates injected — the earliest 50 page events re-sent (mids
    renamed so they would inflate counts if accepted) in a trailing
    micro-batch AFTER the first flush sentinel pushed the watermark hours
    past end-of-data. The entry shares the NORMAL batch oracle: the hash
    can only match if every late row is discarded (the reference has no
    allowed-lateness or late side-output — default watermark semantics,
    SURVEY.md W12)."""
    page = _page_log(spark, sf_dir)
    late = (
        page.orderBy("ts", "event_id")
        .limit(50)
        .withColumn("mid", F.concat(F.lit("late_"), F.col("mid")))
    )
    with TempStreamDir() as d:
        _write_replay(
            page,
            d.sub("in"),
            order_by=["ts"],
            sentinels=lambda mx: [
                _page_sentinel(page, mx, hours=1),
                late,
                _page_sentinel(page, mx, hours=2),
            ],
            max_col="ts",
        )
        s = read_stream(spark, d.sub("in"))
        s = s.withColumn("rt", rt_from_ms(F.col("ts"))).withWatermark("rt", "2 seconds")
        words = s.filter(
            (F.col("page_id") == "search")
            & (F.col("item_type") == "keyword")
            & F.col("item").isNotNull()
        ).select(F.explode(tokenize(F.col("item"))).alias("word"), "rt")
        agg = (
            words.groupBy(F.window("rt", "10 seconds").alias("w"), "word")
            .agg(F.count(F.lit(1)).alias("keyword_count"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
                F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
                F.lit("search").alias("source"),
                F.col("word").alias("keyword"),
                "keyword_count",
            )
        )
        return run_to_memory(agg, output_mode="append").filter(
            F.col("keyword") != SENTINEL_WORD
        )


def stream_dim_user_info_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime schema evolution UNDER STREAMING (J10 + the reference's
    checkTable ALTER path, RT/app/func/TableProcessFunction.java:84-106):
    the broadcast config changes between micro-batches — replay files are
    split at the v2 config's effective_ts, the per-batch provider serves
    the v1 column list for the early batches and the widened v2 list
    (+phone_num) after, and the router's allowMissingColumns merge gives
    rows upserted before the change NULL in the new column. Final table
    must hash-match the batch era-split oracle
    (``dim_user_info_schema_evolve``)."""
    from ..plans.dim import USER_INFO_EVOLUTION
    from .dim_app import dim_router

    v1, v2 = USER_INFO_EVOLUTION
    t_switch = v2.effective_ts
    with TempStreamDir() as d:
        structured = _topic_db_cached(spark, sf_dir, ["user_info"])
        early = structured.filter(F.col("ts").cast("long") < t_switch)
        late = structured.filter(F.col("ts").cast("long") >= t_switch)
        # Early era as the N_FILES range files; the late era rides the
        # trailing-file mechanism so the config flip lands exactly on the
        # era boundary (batch ids 0..N_FILES-1 = v1, >= N_FILES = v2).
        _write_replay(early, d.sub("in"), order_by=["ts"], sentinels=[late])
        s = read_stream(spark, d.sub("in"))
        out_dir = d.sub("dims")
        provider = lambda batch_id: [  # noqa: E731
            (v1 if batch_id < N_FILES else v2).cfg
        ]
        run_foreach_batch(s, dim_router(out_dir, provider))
        return (
            read_dim_table(spark, out_dir, "dim_user_info")
            .select("id", "name", "phone_num", "create_time")
            .localCheckpoint()
        )


def stream_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPLETE output mode — the third Structured Streaming output form
    beside the append-mode windows and the foreachBatch/update-style
    MERGEs: a running global histogram whose memory sink holds the latest
    full snapshot each micro-batch, so after availableNow the table equals
    the batch histogram exactly. No watermark: complete mode retains every
    group, bounded here by the bin space — the production contract for
    complete-mode aggregations (state = O(groups), never O(rows))."""
    from ..operators.profiling import value_histogram
    from ..sources import tables

    e = tables.load(spark, sf_dir, "events").select(
        "event_type", F.unix_millis(F.col("ts")).alias("ts_ms"), "value"
    )
    with TempStreamDir() as d:
        _write_replay(e, d.sub("in"), order_by=["ts_ms"])
        s = read_stream(spark, d.sub("in"))
        return run_to_memory(value_histogram(s), output_mode="complete")


def stream_activity_coupon_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 as a WATERMARKED STREAM-STREAM FULL OUTER join — the join mode
    Spark gates hardest: matched rows emit immediately, unmatched rows
    only when BOTH sides\' watermarks pass the join bound. Matching
    activity/coupon rows share their CDC ts exactly (verified max delta
    0), so the ±5 s band is lossless and the result hash-matches the
    batch J8 oracle.

    Both tables ride ONE replayed topic_db stream split into two
    watermarked branches (the reference\'s actual topology — one Kafka
    topic, per-job filters; same shape as stream_order_pre_process): with
    a single ts-ordered file source the branches co-advance through event
    time, whereas two independently range-partitioned sources drift apart
    at file boundaries and the global watermark late-drops the slower
    side (measured: ~half the rows lost). Sentinels carry one row PER
    TABLE per wave so each branch\'s pushed-down filter lets its watermark
    advance; the per-wave activity and coupon sentinels share an
    order_detail_id and ts, so they match EACH OTHER in the join — the
    coalesced id keeps its __sent_ prefix and the output-side prefix
    filter drops the joined row."""
    d_col = F.col("data")
    tables_ = ["order_detail_activity", "order_detail_coupon"]

    def _sent(mx: int, h: int) -> DataFrame:
        return spark.createDataFrame(
            [("gmall", t, "insert", {"order_detail_id": f"__sent_{h}"},
              None, str(int(mx) + h * 3600)) for t in tables_],
            "database string, `table` string, type string, "
            "data map<string,string>, old map<string,string>, ts string",
        )

    with TempStreamDir() as dirs:
        raw = _topic_db_cached(spark, sf_dir, tables_).withColumn(
            "__order", F.col("ts").cast("long")
        )
        _write_replay(
            raw, dirs.sub("in"), order_by=["__order"],
            sentinels=lambda mx: [_sent(mx, 1), _sent(mx, 2)],
            max_col="__order",
        )
        s = read_stream(spark, dirs.sub("in")).drop("__order")

        def branch(table: str, id_alias: str, cols: dict[str, str]) -> DataFrame:
            b = s.filter(F.col("table") == table).select(
                d_col.getItem("order_detail_id").alias(id_alias),
                *[d_col.getItem(src_).alias(dst) for src_, dst in cols.items()],
                F.timestamp_seconds(F.col("ts").cast("long")).alias(f"{id_alias}_et"),
            )
            return b.withWatermark(f"{id_alias}_et", "5 seconds")

        oa = branch(
            "order_detail_activity", "a_detail_id",
            {"activity_id": "activity_id", "activity_rule_id": "activity_rule_id"},
        )
        oc = branch(
            "order_detail_coupon", "c_detail_id",
            {"coupon_id": "coupon_id", "coupon_use_id": "coupon_use_id"},
        )
        joined = oa.join(
            oc,
            (F.col("a_detail_id") == F.col("c_detail_id"))
            & (F.col("c_detail_id_et") >= F.col("a_detail_id_et") - F.expr("INTERVAL 5 SECONDS"))
            & (F.col("c_detail_id_et") <= F.col("a_detail_id_et") + F.expr("INTERVAL 5 SECONDS")),
            "full_outer",
        ).select(
            F.coalesce("a_detail_id", "c_detail_id").alias("order_detail_id"),
            "activity_id",
            "activity_rule_id",
            "coupon_id",
            "coupon_use_id",
        )
        return run_to_memory(joined, output_mode="append").filter(
            ~F.col("order_detail_id").startswith("__sent_")
        )


def stream_type_counts_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPLETE-mode global sort+limit: Structured Streaming allows ORDER
    BY (and LIMIT after it) only in complete mode, where every trigger
    re-emits the full sorted snapshot; after availableNow the memory sink
    holds exactly the batch top-k. State is O(groups) (6 event types),
    never O(rows)."""
    from ..operators.analytics import type_counts_top
    from ..sources import tables

    e = tables.load(spark, sf_dir, "events").select(
        "event_type", F.unix_millis(F.col("ts")).alias("ts_ms")
    )
    with TempStreamDir() as d:
        _write_replay(e, d.sub("in"), order_by=["ts_ms"])
        s = read_stream(spark, d.sub("in"))
        return run_to_memory(type_counts_top(s), output_mode="complete")


def stream_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch maintained ONLINE (r11): events replayed in
    micro-batches; each batch explodes to its d (row_i, bucket)
    increments and the ADDITIVE MERGE sink
    (:func:`..streaming.stateful.upsert_sink_snapshot_agg`) folds them
    into the persistent counter table — counter = counter + inc through
    the MVCC commit protocol with idempotent batch replay. Counters are
    additive, so the streamed table equals the one-pass batch build
    EXACTLY, and the final estimate (batch min-over-rows join against
    exact per-key counts) shares the batch entry's oracle verbatim —
    the production shape: sketch maintained on ingest, queried offline.
    State beyond the counter table itself: one integer (last_batch) in
    the manifest."""
    import os

    from ..operators import analytics
    from ..sources import tables
    from . import stateful

    e = tables.load(spark, sf_dir, "events").select(
        "user_id", F.unix_millis(F.col("ts")).alias("ts_ms")
    )
    with TempStreamDir() as d:
        _write_replay(e, d.sub("in"), order_by=["ts_ms"])
        s = read_stream(spark, d.sub("in"))
        inc = s.select(
            F.explode(analytics.cms_slot_array()).alias("rb")
        ).select(
            F.col("rb.row_i"), F.col("rb.bucket"), F.lit(1).alias("counter")
        )
        sink = d.sub("cms")
        os.makedirs(sink, exist_ok=True)
        run_foreach_batch(
            inc,
            stateful.upsert_sink_snapshot_agg(
                ["row_i", "bucket"], ["counter"], sink
            ),
        )
        counters = stateful.read_upsert_snapshot(spark, sink)
        counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
        return analytics.cms_estimate_topk(
            counts, counters, analytics.CMS_TOP_K
        ).localCheckpoint()


def stream_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup LIVE: the incoming half of the corpus replayed
    as a document stream; each micro-batch flags its docs against the
    static base corpus — a stream-static left join on the md5 hash (the
    base ships only (hash, min doc_id), never text) plus a stream-static
    near-pair lookup — and appends verdicts to the sink. This is the
    new-crawl-vs-corpus pass exactly as it runs at ingestion: batch-size
    x lookup cost per trigger, the base never self-joins.

    The base stays frozen across the replay so stream == batch == oracle
    (the batch contract deliberately ignores intra-batch pairs; an
    evolving base would reclassify later in-stream clones of earlier
    'new' docs). The evolving-base keyed-MERGE mechanics are separately
    proven by stream_order_info_upsert / stream_dim_coupon_scd2.
    """
    from ..operators import text_dedup as td

    # Late import: api is fully initialized by the time any entry runs;
    # reusing its memos shares the corpus + pair materializations with the
    # batch entry instead of re-paying the shingle self-join here.
    from .. import api

    corpus = api._corpus(spark, sf_dir)
    pairs = api._ngram_pairs(spark, sf_dir)
    is_base = F.col("doc_id") < td.INCREMENTAL_BASE_MAX
    base_h = (
        corpus.filter(is_base)
        .select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("exact_dup_of"))
    )
    near = (
        pairs.filter(
            (F.col("a") < td.INCREMENTAL_BASE_MAX)
            & (F.col("b") >= td.INCREMENTAL_BASE_MAX)
        )
        .groupBy(F.col("b").alias("doc_id"))
        .agg(F.min("a").alias("near_dup_of"))
    )
    with TempStreamDir() as d:
        inc = corpus.filter(~is_base).select("doc_id", "text")
        _write_replay(inc, d.sub("in"), order_by=["doc_id"])
        s = read_stream(spark, d.sub("in"))
        flagged = (
            s.select("doc_id", F.md5("text").alias("h"))
            .join(base_h, "h", "left")
            .join(near, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("exact_dup_of", "near_dup_of").alias("dup_of"),
                F.when(F.col("exact_dup_of").isNotNull(), F.lit("exact"))
                .when(F.col("near_dup_of").isNotNull(), F.lit("near"))
                .otherwise(F.lit("new"))
                .alias("match_type"),
            )
        )
        return run_to_memory(flagged, output_mode="append")


def stream_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-policy enforcement at INGESTION: the (lang, sample_ppm)
    policy table — a static artifact computed once from the corpus the
    weights were fit against — rides a stream-static broadcast join over
    the replayed document stream; each micro-batch keeps its share via
    the same hash threshold as the batch entry. Stateless append: no
    watermark, no state store — exactly how a sampling policy runs live.
    stream == batch == oracle (same policy, same hash keep-set)."""
    from ..operators import text_analysis as ta
    from ..sources import tables

    docs = tables.load(spark, sf_dir, "documents")
    # Pin the policy table as a LITERAL: a lazy rates plan would re-run
    # the full per-lang corpus agg on every micro-batch of the
    # stream-static join; the collected artifact is |langs| rows.
    rates = spark.createDataFrame(
        ta.mixture_rates(docs).collect(), "lang string, sample_ppm bigint"
    )
    with TempStreamDir() as d:
        _write_replay(
            docs.select("doc_id", "lang", "n_chars"), d.sub("in"),
            order_by=["doc_id"],
        )
        s = read_stream(spark, d.sub("in"))
        return run_to_memory(ta.apply_mixture(s, rates))


def stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination at INGESTION: candidate docs replayed as
    a document stream, each micro-batch's shingles tested against the
    STATIC held-out benchmark shingle set — the pass a crawl pipeline
    runs before anything reaches the training corpus, live.

    The benchmark set is pinned as a collected literal DataFrame (eval
    sets are bounded artifacts, orders of magnitude smaller than the
    corpus — the same broadcast posture as the batch entry; a lazy plan
    would re-run the benchmark shingle agg every micro-batch). The
    per-doc overlap count is a stream-static broadcast LEFT join over
    the exploded shingles + a COMPLETE-mode count (a doc's shingles all
    arrive in its one input row, so the count is exact at every
    snapshot). stream == batch == oracle (decontaminate_ngram's).
    """
    from .. import api
    from ..operators import text_dedup as td

    corpus = api._corpus(spark, sf_dir)
    is_bench = (F.col("doc_id") % td.BENCH_MOD == 0) & (
        F.col("doc_id") < 1_000_000
    )
    bench = spark.createDataFrame(
        td.shingles_exploded(corpus.filter(is_bench), n=td.DECON_N)
        .select("shingle")
        .distinct()
        .collect(),
        "shingle string",
    ).withColumn("hit", F.lit(1))
    with TempStreamDir() as d:
        cand = corpus.filter(~is_bench).select("doc_id", "text")
        _write_replay(cand, d.sub("in"), order_by=["doc_id"])
        s = read_stream(spark, d.sub("in"))
        marked = td.shingles_exploded(s, n=td.DECON_N).join(
            F.broadcast(bench), "shingle", "left"
        )
        agg = (
            marked.groupBy("doc_id")
            .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"))
            .select(
                "doc_id",
                F.col("n_overlap").cast("bigint").alias("n_overlap"),
                (F.col("n_overlap") > 0).cast("int").alias("contaminated"),
            )
        )
        return run_to_memory(agg, output_mode="complete")


def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation gate at INGESTION: the composed Gopher-rules +
    quality-score keep/drop decision applied to each micro-batch of the
    replayed document stream — the stateless filter a crawl pipeline
    runs inline before anything is materialized. Pure projection (no
    state, no watermark, append mode): the gate column set is built by
    the SAME shared builders as the batch entry, so stream == batch ==
    oracle by construction."""
    from ..operators import text_analysis as ta

    from ..sources import tables

    docs = tables.load(spark, sf_dir, "documents")
    with TempStreamDir() as d:
        _write_replay(
            docs.select("doc_id", "text", "lang"), d.sub("in"),
            order_by=["doc_id"],
        )
        s = read_stream(spark, d.sub("in"))
        return run_to_memory(ta.quality_gate(s))


def stream_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode at INGESTION: the Arrow-batched mapInPandas
    feature stage applied to each micro-batch of the replayed media
    stream (binary payload + metadata struct). Stateless append — the
    Python stage sees the same Arrow record-batch contract per
    micro-batch as in batch mode, so stream == batch == oracle by
    construction; metadata-only predicates stay Catalyst-side ahead of
    Python exactly as in the batch plan."""
    from ..operators import multimodal
    from ..sources import corpus as corpus_mod

    media = multimodal.with_binary_payload(corpus_mod.corpus(spark, sf_dir))
    with TempStreamDir() as d:
        _write_replay(media, d.sub("in"), order_by=["doc_id"])
        s = read_stream(spark, d.sub("in"))
        return run_to_memory(multimodal.decode_features(s))


def stream_value_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trailing-hour per-user feature ONLINE: watermark-correct
    keyed-state trailing window (see ``stateful.trailing_window_stream``)
    over the replayed events stream. Emission waits for the watermark to
    pass each event's timestamp, so every RANGE-frame member (peers
    included) has arrived and the output equals the batch
    ``events_value_trailing_window`` row-for-row — the registry entry
    shares the batch SQL oracle. Sentinels: two heartbeat rows 2 h / 4 h
    past max event time flush the final frames; the synthetic user is
    dropped from the materialized output."""
    from ..sources import tables

    e = tables.load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("unix_millis(ts) DIV 1000").alias("ts_s"),
        F.round(F.col("value") * 1e6).cast("bigint").alias("v_micro"),
    )
    with TempStreamDir() as d:

        def sents(mx: int) -> list:
            return [
                spark.createDataFrame(
                    [(-1, -1, mx + h * 3600, 0)],
                    "user_id long, event_id long, ts_s long, v_micro long",
                )
                for h in (2, 4)
            ]

        _write_replay(
            e, d.sub("in"), order_by=["ts_s"], sentinels=sents, max_col="ts_s"
        )
        s = read_stream(spark, d.sub("in")).withColumn(
            "rt", F.timestamp_seconds(F.col("ts_s"))
        )
        out = stateful.trailing_window_stream(
            s, timeseries.TRAIL_WINDOW_SEC
        )
        # NOT widened (r12): isolated A/B read flat (21.8 -> 21.2 s at
        # sf0.1 — 1.5k keys don't starve 8 partitions) and the in-lane
        # freeze read 2x WORSE with 32 RocksDB instances; the widening
        # pays only when the replay is key-bound (see the debounce).
        return run_to_memory(out).filter(F.col("user_id") >= 0)


def stream_multimodal_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual fingerprinting at INGESTION: the dHash Arrow stage
    applied per micro-batch of the replayed image stream — the
    fingerprint-on-arrival half of the perceptual dedup pipeline (the
    banded pair join stays a batch/periodic job over the accumulated
    fingerprint table, exactly how a production near-dup system splits
    online/offline). Stateless append; the metadata format predicate
    stays Catalyst-side ahead of Python; stream == batch fingerprints
    row-for-row (pinned in test_streaming; registry rows-only — the
    byte-grid hash has no single-SQL DuckDB twin)."""
    from ..operators import multimodal
    from ..sources import corpus as corpus_mod

    media = multimodal.with_binary_payload(corpus_mod.corpus(spark, sf_dir))
    with TempStreamDir() as d:
        _write_replay(media, d.sub("in"), order_by=["doc_id"])
        s = read_stream(spark, d.sub("in"))
        return run_to_memory(multimodal.dhash_fingerprints(s))


def stream_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online ANN SERVING: the IVF index (centroids + assignments) is
    built ONCE at job start from the static corpus and persisted; the
    query stream replays file-per-micro-batch and each batch probes the
    index via the stream-static bucket equi-join + per-query rank
    (foreachBatch, because rank windows are batch-semantics per request
    set — the request/response shape of a vector-search service). Each
    query id arrives exactly once, so appending per-batch results is
    exact: the final table must equal the batch ivf_topk output
    row-for-row (pinned in test_streaming; registry rows-only)."""
    from pyspark.sql import Window

    from ..operators import simsearch
    from ..sources import tables

    emb = tables.load(spark, sf_dir, "embeddings")
    cen, assigned = simsearch.ivf_index(emb)
    assigned = assigned.persist()  # the served index, materialized once
    try:
        queries = simsearch._queries(emb, 100)
        with TempStreamDir() as d:
            _write_replay(queries, d.sub("in"), order_by=["q_id"])
            s = read_stream(spark, d.sub("in"))
            out = d.sub("results")

            def serve(batch: DataFrame, batch_id: int) -> None:
                scored = simsearch._ivf_candidates(batch, cen, assigned)
                w = Window.partitionBy("q_id").orderBy(
                    F.col("cosine_sim").desc(), F.col("neighbor_id")
                )
                (
                    scored.withColumn("rank", F.row_number().over(w))
                    .filter(F.col("rank") <= 10)
                    .select("q_id", "neighbor_id", "rank", "cosine_sim")
                    .write.mode("append")
                    .parquet(out)
                )

            run_foreach_batch(s, serve)
            return spark.read.parquet(out).localCheckpoint()
    finally:
        assigned.unpersist()


def stream_fasttext_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train-offline / apply-online classifier split: the model is
    fit ONCE on the static corpus (the bounded (weights, bias) artifact —
    exactly what a production scorer loads at job start) and each
    micro-batch of the replayed document stream is scored by the same
    zero-shuffle projection as the batch entry. Stateless append; stream
    == batch == oracle because the model literal and the scoring
    expression are shared verbatim."""
    from ..operators import text_analysis as ta
    from ..sources import tables

    docs = tables.load(spark, sf_dir, "documents")
    model = ta.fit_model(docs)  # offline fit, bounded artifact
    with TempStreamDir() as d:
        _write_replay(
            docs.select("doc_id", "text", "lang"), d.sub("in"),
            order_by=["doc_id"],
        )
        s = read_stream(spark, d.sub("in"))
        return run_to_memory(ta.fasttext_score_trained(s, model))


def stream_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-health monitoring at INGESTION: the per-label squared-
    norm min/mean/max report maintained live over the replayed embedding
    stream (the drift check an indexing pipeline alerts on). COMPLETE
    mode: one hash aggregation keyed on label — state is O(|labels|),
    never O(rows) — and after availableNow the snapshot equals the batch
    entry exactly (same micro-unit fold, same oracle)."""
    from ..operators import simsearch as ss
    from ..sources import tables

    emb = tables.load(spark, sf_dir, "embeddings")
    with TempStreamDir() as d:
        _write_replay(emb.select("vec_id", "embedding", "label"),
                      d.sub("in"), order_by=["vec_id"])
        s = read_stream(spark, d.sub("in"))
        return run_to_memory(ss.norm_stats(s), output_mode="complete")


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once redelivery absorption with BOUNDED state: the feed
    re-delivers every 5th event (identical payload, identical event
    time — the broker-retry pathology exactly-once sinks exist for) and
    the stream drops the copies with
    ``dropDuplicatesWithinWatermark(["event_id"])`` — Spark's
    watermark-evicted dedup. The plain ``dropDuplicates`` keeps one
    state row per key FOREVER (unbounded at 1e12 events/day);
    WithinWatermark evicts a key's fingerprint once the watermark
    passes its event time + delay, so state tracks the redelivery
    horizon (here 10 s), not the stream's lifetime — the documented
    contract being that a duplicate is only absorbed if it arrives
    within the watermark delay of the first copy, which is what broker
    retries look like. Output is the deduped append stream itself;
    oracle = the original events (copies are byte-identical, so
    whichever copy survives, the ROWS equal the originals)."""
    from ..sources import tables

    e = tables.load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    feed = e.unionByName(e.filter(F.col("event_id") % 5 == 0))
    with TempStreamDir() as d:
        _write_replay(feed, d.sub("in"), order_by=["ts"])
        s = read_stream(spark, d.sub("in"))
        deduped = s.withWatermark("ts", "10 seconds").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        out = deduped.select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "event_type",
            "value",
        )
        return run_to_memory(out)


def stream_order_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's updating-stream aggregate as a LIVE retract fold: the
    order_info CDC replay parses per micro-batch, every event becomes
    +/-1 deltas against its (province, status) group (the retraction
    comes from the envelope's ``old`` image — no per-order state), and
    a complete-mode SUM holds the running counts. Aggregate state is
    one counter per GROUP (provinces x statuses), not per order — the
    reason a retract aggregate survives 1e9 keys where keep-latest
    carries one state row per key. Snapshot equals the batch entry and
    shares its latest-state-per-id oracle."""
    from ..plans import dws as dws_plan

    with TempStreamDir() as d:
        raw = cdc.topic_db_json(spark, sf_dir, only=["order_info"])
        _write_replay(raw, d.sub("in"), order_by=None)
        ev = cdc.parse_topic_db(read_stream(spark, d.sub("in")))
        out = dws_plan.order_status_counts_from_deltas(
            dws_plan.order_status_count_deltas(ev)
        )
        return run_to_memory(out, output_mode="complete")


def stream_er_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution on arrival: the dirty customer variants replay
    as a stream and each micro-batch rides the SAME two blocking
    equi-joins (stream-static, stateless) and verify predicate as the
    batch `er_resolve_customers`; the best-match cut is a keyed
    complete-mode MIN aggregate (state = one struct per variant — the
    output's own size). The final snapshot shares the batch entry's
    oracle row-for-row. No watermark needed: nothing here is
    event-time-windowed, so bounded replay terminates without sentinel
    flush rows."""
    from ..operators import linkage
    from ..sources import tables

    customer = tables.load(spark, sf_dir, "customer")
    variants = linkage.inject_noisy_customers(customer)
    with TempStreamDir() as d:
        _write_replay(variants, d.sub("in"), order_by=["variant_key"])
        s = read_stream(spark, d.sub("in"))
        snap = run_to_memory(
            linkage.resolve_online(s, customer), output_mode="complete"
        )
        return linkage.finish_online(snap)


def stream_expectation_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The acceptance suite as a LIVE quality monitor: the same
    conditional-count rule aggregate runs as a streaming COMPLETE-mode
    aggregation (state = ONE group of counters whatever the stream
    volume — the cheapest stateful shape there is), so each micro-batch
    the memory sink holds the suite's cumulative verdict; after
    availableNow the unpivoted snapshot equals the batch
    events_expectation_check row-for-row and shares its SQL oracle. The
    unpivot runs on the 1-row SINK table, not inside the stream
    (Generate after a streaming aggregation is not a supported
    streaming shape — and needn't be: the report is constant-size)."""
    from ..operators.analytics import expectation_agg, expectation_unpivot
    from ..sources import tables

    e = tables.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    with TempStreamDir() as d:
        _write_replay(e, d.sub("in"), order_by=["ts"])
        s = read_stream(spark, d.sub("in"))
        snap = run_to_memory(expectation_agg(s), output_mode="complete")
        return expectation_unpivot(snap)
