"""Keyed-state streaming operators (SURVEY.md §2.6) via applyInPandasWithState.

These are the true-streaming twins of the batch window-function forms in
:mod:`..operators.dedup`; the batch forms are the oracle in stream==batch
parity tests (tests/test_streaming.py).

- :func:`first_per_day_stream` — D1 UV dedup: per-key ValueState of the
  last emitted date (reference: RT/app/dwd/DwdTrafficUniqueVisitorDetail.java:76-105,
  state TTL 1 day == daily rollover of the date value).
- :func:`is_new_repair_stream` — P8 new-visitor flag repair: ValueState of
  the first-visit date, backfilled to "old" for visitors first seen with
  is_new=0 (reference: RT/app/dwd/BaseLogApp.java:76-105).
- :func:`jump_detect_stream` — D5 CEP bounce detection: pending
  session-start buffered in state, closed by the next event or a 10 s
  event-time timeout (reference: RT/app/dwd/DwdTrafficUserJumpDetail.java:73-119;
  matched ∪ timed-out first events).
- :func:`upsert_sink` — K3 keyed last-writer-wins sink (upsert-kafka
  equivalent; reference: RT/utils/MyKafkaUtil.java:112-121) as a
  foreachBatch parquet MERGE.

Rows are processed in (ts, tiebreak) order inside each key group and the
replay harness feeds time-ordered micro-batches, so the state transitions
see the same event order as the reference's Kafka consumption.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _sorted_concat(pdfs: Iterator[pd.DataFrame], order: list[str]) -> pd.DataFrame:
    chunks = [p for p in pdfs]
    if not chunks:
        return pd.DataFrame()
    if len(chunks) == 1:
        # common case: one Arrow batch per group — skip the concat copy
        # (r13 optimization round; same sort, same rows)
        return chunks[0].sort_values(order, kind="mergesort")
    return pd.concat(chunks).sort_values(order, kind="mergesort")


def first_per_day_stream(
    df: DataFrame,
    key: str = "mid",
    dt_col: str = "dt",
    order: list[str] | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """Emit each key's first row per calendar day (streaming D1).

    Bucketed grouping (r14 optimization round, same scheme as
    :func:`keep_latest_stream`): groups are hash buckets of ``key``; the
    pickled dict state maps key -> last emitted date. Rows are
    bucket-sorted stably by ``order`` so each key's subsequence is the
    per-key sorted order; the per-key last-date transition is unchanged,
    so the emitted row set is identical.
    """
    import pickle

    order = order or ["ts", "event_id"]
    out_schema = df.schema
    out_cols = [f.name for f in out_schema.fields]
    state_schema = StructType([StructField("last_dts", BinaryType())])

    def fn(bucket_, pdfs: Iterator[pd.DataFrame], state: GroupState):
        pdf = _sorted_concat(pdfs, order)
        if pdf.empty:
            return
        last = pickle.loads(bytes(state.get[0])) if state.exists else {}
        keep = []
        for i, (k, row_dt) in enumerate(zip(pdf[key], pdf[dt_col])):
            if row_dt != last.get(k):
                keep.append(i)
                last[k] = row_dt
        state.update((pickle.dumps(last),))
        yield pdf[out_cols].iloc[keep]

    return (
        df.withColumn("__bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))
        .groupBy("__bucket")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def is_new_repair_stream(
    df: DataFrame,
    key: str = "mid",
    dt_col: str = "dt",
    is_new_col: str = "is_new",
    order: list[str] | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """Repair the is_new flag with per-key first-visit-date state (P8).

    State holds the first-visit date when the key's first event claimed
    is_new=1, else the sentinel '' (visitor known old). is_new stays 1 only
    while raw=1 and the event date equals the stored first-visit date.

    Bucketed grouping (r14 optimization round, same scheme as
    :func:`keep_latest_stream`): groups are hash buckets of ``key``; the
    pickled dict state maps key -> first-visit date (or the '' sentinel).
    The per-key transition below is unchanged.
    """
    import pickle

    order = order or ["ts", "event_id"]
    out_schema = df.schema
    out_cols = [f.name for f in out_schema.fields]
    state_schema = StructType([StructField("first_dts", BinaryType())])

    def fn(bucket_, pdfs: Iterator[pd.DataFrame], state: GroupState):
        pdf = _sorted_concat(pdfs, order)
        if pdf.empty:
            return
        first = pickle.loads(bytes(state.get[0])) if state.exists else {}
        fixed = []
        for k, raw, row_dt in zip(pdf[key], pdf[is_new_col], pdf[dt_col]):
            first_dt = first.get(k)
            if first_dt is None:
                first_dt = row_dt if raw == "1" else ""
                first[k] = first_dt
            fixed.append("1" if (raw == "1" and row_dt == first_dt) else "0")
        state.update((pickle.dumps(first),))
        pdf = pdf[out_cols].assign(**{is_new_col: fixed})
        yield pdf

    return (
        df.withColumn("__bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))
        .groupBy("__bucket")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


DEBOUNCE_MS = 5_000


def keep_latest_stream(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    watermark_col: str = "rt",
    n_buckets: int = 2048,
) -> DataFrame:
    """D4/W6 keep-LATEST per key with a 5 s debounce timer (reference:
    RT/app/dws/DwsTradePaymentSucWindow.java:85-121,
    RT/app/dws/DwsTradeProvinceOrderWindow.java:86-121): the first row of
    a burst anchors a timer 5 s out; rows arriving before it replace the
    buffered row if their ``order_col`` is newer; the timer emits the
    survivor and clears state — absorbing left-join retraction bursts
    before the row is released downstream.

    The reference's timer is processing-time; here it is EVENT-time
    (timeout at anchor + 5 s, fired by the watermark on
    ``watermark_col``). Processing-time timers never let an
    ``availableNow`` replay terminate (the engine keeps scheduling
    no-data batches against the wall clock), and on replay
    arrival-proximity IS event-proximity, so event time is the faithful
    bounded mapping — and makes emissions deterministic: one per (key,
    5 s burst), independent of how files split into micro-batches.

    Bucketed grouping (r14 optimization round, guide §4.2/§2.3 "one
    Python call per key per batch is the API floor — so group by fewer
    keys"): the operator groups by a deterministic hash BUCKET of the
    key (``pmod(xxhash64(keys), n_buckets)``) and keeps a dict of
    per-key (buffered row, anchor) entries inside one pickled state
    value, instead of one state row + one Python call per key. With
    ~150 k order ids over 4 micro-batches the per-key form paid ~450 k
    Python fn calls and state-store puts; the bucketed form pays
    ``n_buckets`` per batch. Per-KEY semantics are unchanged:

    - rows are bucket-sorted stably by ``order_col``, so each key's
      subsequence is exactly the per-key sorted order (same tie-breaks);
    - the per-key burst/anchor/keep-latest transitions below are the
      r13 per-key loop verbatim;
    - Spark fires a key's event-time timer when ``timeout < watermark``
      (strict); the bucket keeps its timer at the MIN pending
      ``anchor + 5 s`` and, on every call, emits exactly the keys with
      ``anchor + 5 s < getCurrentWatermarkMs()`` — the same watermark
      value (eventTimeWatermarkForEviction) the per-key firing predicate
      used, so every key emits in the same micro-batch with the same
      buffered row as the per-key form. Parity gates: the TWS
      row-identity test, the split-invariance test, the anchor-semantics
      test, and the registry oracle hash.
    """
    import pickle

    out_schema = df.drop(watermark_col).schema
    out_cols = [f.name for f in out_schema.fields]
    oc_i = out_cols.index(order_col)
    key_is = [out_cols.index(k) for k in keys]
    state_schema = StructType([StructField("pending", BinaryType())])

    def fn(bucket_, pdfs: Iterator[pd.DataFrame], state: GroupState):
        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            pending = pickle.loads(bytes(state.get[0]))
            done, keep = [], {}
            for k, (best, anchor) in pending.items():
                if anchor + DEBOUNCE_MS < wm:
                    done.append(best)
                else:
                    keep[k] = (best, anchor)
            if keep:
                state.update((pickle.dumps(keep),))
                state.setTimeoutTimestamp(
                    max(wm, min(a + DEBOUNCE_MS for _, a in keep.values()))
                )
            else:
                state.remove()
            if done:
                yield pd.DataFrame(done, columns=out_cols)
            return
        pending = pickle.loads(bytes(state.get[0])) if state.exists else {}
        rows = []
        for pdf in pdfs:
            if len(pdf.index):
                rows.extend(pdf[out_cols].itertuples(index=False, name=None))
        done = []
        touched = set()
        if rows:
            rows.sort(key=lambda r: r[oc_i])
            for row in rows:
                k = tuple(row[i] for i in key_is)
                touched.add(k)
                row_ms = int(row[oc_i]) * 1000
                ent = pending.get(k)
                if ent is None:
                    pending[k] = (row, row_ms)
                    continue
                best, anchor = ent
                if row_ms - anchor > DEBOUNCE_MS:
                    done.append(best)  # burst closed in-stream
                    pending[k] = (row, row_ms)
                elif row[oc_i] >= best[oc_i]:
                    pending[k] = (row, anchor)
        if wm > 0 and len(touched) < len(pending):
            # keys with no data this batch whose per-key timer would have
            # fired (the per-key form's hasTimedOut call; suppressed here
            # because the BUCKET received data).
            for k in list(pending):
                if k in touched:
                    continue
                best, anchor = pending[k]
                if anchor + DEBOUNCE_MS < wm:
                    done.append(best)
                    del pending[k]
        if pending:
            state.update((pickle.dumps(pending),))
            state.setTimeoutTimestamp(
                max(wm, min(a + DEBOUNCE_MS for _, a in pending.values()))
            )
        else:
            state.remove()
        if done:
            yield pd.DataFrame(done, columns=out_cols)

    return (
        df.withWatermark(watermark_col, "2 seconds")
        .withColumn(
            "__bucket",
            F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)),
        )
        .groupBy("__bucket")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


JUMP_GAP_MS = 10_000


def jump_detect_stream(
    page: DataFrame,
    key: str = "mid",
    ts_col: str = "ts",
    last_page_col: str = "last_page_id",
    watermark_col: str = "rt",
    order: list[str] | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """Bounce detection (D5): a session start (last_page_id IS NULL) is a
    bounce unless a non-session-start event follows within 10 s.

    The pending session start sits in keyed state with an event-time timeout
    at pending_ts + 10 s; the watermark (driven by ``watermark_col``)
    closes it when no successor arrives — the CEP ``within(10s)`` timeout
    side-output of the reference.

    Bucketed grouping (r14 optimization round): same scheme as
    :func:`keep_latest_stream` — groups are hash BUCKETS of ``key``, the
    state is a pickled dict of per-key pending rows, the bucket timer
    sits at the MIN pending ``ts + 10 s``, and on every call keys whose
    per-key timer would have fired (``ts + 10 s < watermark``, the
    per-key firing predicate verbatim) emit their pending row. Rows are
    bucket-sorted stably by ``order`` so each key sees its rows in the
    per-key order; the per-key transitions are the r13 loop verbatim.
    """
    import pickle

    order = order or [ts_col, "event_id"]
    out_schema = page.drop(watermark_col).schema
    out_cols = [f.name for f in out_schema.fields]
    ts_i = out_cols.index(ts_col)
    lp_i = out_cols.index(last_page_col)
    key_i = out_cols.index(key)
    sort_is = [out_cols.index(c) for c in order]
    state_schema = StructType([StructField("pending", BinaryType())])

    def fn(bucket_, pdfs: Iterator[pd.DataFrame], state: GroupState):
        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            pending = pickle.loads(bytes(state.get[0]))
            done, keep = [], {}
            for k, row in pending.items():
                if int(row[ts_i]) + JUMP_GAP_MS < wm:
                    done.append(row)
                else:
                    keep[k] = row
            if keep:
                state.update((pickle.dumps(keep),))
                state.setTimeoutTimestamp(
                    max(wm, min(int(r[ts_i]) + JUMP_GAP_MS for r in keep.values()))
                )
            else:
                state.remove()
            if done:
                yield pd.DataFrame(done, columns=out_cols)
            return
        pending = pickle.loads(bytes(state.get[0])) if state.exists else {}
        rows = []
        for pdf in pdfs:
            if len(pdf.index):
                rows.extend(pdf[out_cols].itertuples(index=False, name=None))
        bounces = []
        touched = set()
        if rows:
            rows.sort(key=lambda r: tuple(r[i] for i in sort_is))
            for row in rows:
                k = row[key_i]
                touched.add(k)
                is_start = row[lp_i] is None or pd.isna(row[lp_i])
                p = pending.get(k)
                if p is not None:
                    gap = row[ts_i] - p[ts_i]
                    if gap > JUMP_GAP_MS:
                        bounces.append(p)  # timed out in-stream
                        if is_start:
                            pending[k] = row
                        else:
                            del pending[k]
                    elif is_start:
                        bounces.append(p)  # matched: start -> start
                        pending[k] = row
                    else:
                        del pending[k]  # successor page: not a bounce
                elif is_start:
                    pending[k] = row
        if wm > 0:
            for k in list(pending):
                if k in touched:
                    continue
                row = pending[k]
                if int(row[ts_i]) + JUMP_GAP_MS < wm:
                    bounces.append(row)
                    del pending[k]
        if pending:
            state.update((pickle.dumps(pending),))
            state.setTimeoutTimestamp(
                max(wm, min(int(r[ts_i]) + JUMP_GAP_MS for r in pending.values()))
            )
        else:
            state.remove()
        if bounces:
            yield pd.DataFrame(bounces, columns=out_cols)

    return (
        page.withWatermark(watermark_col, "2 seconds")
        .withColumn("__bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))
        .groupBy("__bucket")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def uv_jump_contrib_stream(
    page: DataFrame,
    watermark_col: str = "rt",
    n_buckets: int = 256,
) -> DataFrame:
    """Combined D1 + D5 keyed operator for the 3-stream union window job:
    ONE applyInPandasWithState per mid computes both the first-visit-
    per-day UV flag and CEP bounce detection, emitting rows pre-shaped as
    union contributions ``(vc, ch, ar, is_new, ts, uv, sv, pv, dur,
    uj)`` with uv=1 or uj=1.

    The reference runs these as two separate Flink jobs over the same
    topic (RT/app/dwd/DwdTrafficUniqueVisitorDetail.java,
    RT/app/dwd/DwdTrafficUserJumpDetail.java); Spark allows only one
    applyInPandasWithState per streaming query, and consolidating the two
    state machines into one keyed pass is the idiomatic answer anyway:
    one shuffle on mid, one state store, both flags from the same sorted
    scan.

    Bucketed grouping (r14 optimization round, same scheme as
    :func:`keep_latest_stream`): groups are hash buckets of mid; the
    pickled dict state maps mid -> [last_uv_dt, pending-5-tuple-or-None].
    The bucket timer is the MIN pending ``ts + 10 s``; on every call,
    un-touched keys whose per-key timer would have fired (strict
    ``< watermark``) emit their bounce contribution and keep their UV
    date alive — exactly the per-key form's timeout branch. An entry
    whose parts are both None mirrors the per-key form's kept empty
    state row.
    """
    import pickle

    order = ["ts", "event_id"]
    out_schema = (
        "vc string, ch string, ar string, is_new string, ts long, "
        "uv long, sv long, pv long, dur long, uj long"
    )
    out_cols = ["vc", "ch", "ar", "is_new", "ts", "uv", "sv", "pv", "dur", "uj"]
    state_schema = StructType([StructField("pending", BinaryType())])
    in_cols = ["mid", "vc", "ch", "ar", "is_new", "ts", "event_id", "last_page_id", "dt"]
    # tuple indexes into in_cols rows
    MID, VC, CH, AR, ISN, TS, EID, LP, DT = range(9)

    def contrib(p5, uv, uj):
        # p5 = (vc, ch, ar, is_new, ts)
        return (*p5, uv, 0, 0, 0, uj)

    def fn(bucket_, pdfs: Iterator[pd.DataFrame], state: GroupState):
        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            ent = pickle.loads(bytes(state.get[0]))
            out = []
            for k, (last_uv_dt, pend) in list(ent.items()):
                if pend is not None and int(pend[4]) + JUMP_GAP_MS < wm:
                    out.append(contrib(pend, 0, 1))
                    if last_uv_dt is not None:
                        ent[k] = (last_uv_dt, None)
                    else:
                        del ent[k]
            _save(state, ent, wm)
            if out:
                yield pd.DataFrame(out, columns=out_cols)
            return
        ent = pickle.loads(bytes(state.get[0])) if state.exists else {}
        rows = []
        for pdf in pdfs:
            if len(pdf.index):
                rows.extend(pdf[in_cols].itertuples(index=False, name=None))
        out = []
        touched = set()
        if rows:
            rows.sort(key=lambda r: (r[TS], r[EID]))
            for row in rows:
                k = row[MID]
                touched.add(k)
                last_uv_dt, pend = ent.get(k, (None, None))
                is_start = row[LP] is None or pd.isna(row[LP])
                if is_start and row[DT] != last_uv_dt:
                    out.append(contrib(row[VC:TS + 1], 1, 0))
                    last_uv_dt = row[DT]
                if pend is not None:
                    gap = row[TS] - pend[4]
                    if gap > JUMP_GAP_MS:
                        out.append(contrib(pend, 0, 1))
                        pend = row[VC:TS + 1] if is_start else None
                    elif is_start:
                        out.append(contrib(pend, 0, 1))
                        pend = row[VC:TS + 1]
                    else:
                        pend = None
                elif is_start:
                    pend = row[VC:TS + 1]
                ent[k] = (last_uv_dt, pend)
        if wm > 0:
            for k, (last_uv_dt, pend) in list(ent.items()):
                if k in touched or pend is None:
                    continue
                if int(pend[4]) + JUMP_GAP_MS < wm:
                    out.append(contrib(pend, 0, 1))
                    if last_uv_dt is not None:
                        ent[k] = (last_uv_dt, None)
                    else:
                        del ent[k]
        _save(state, ent, wm)
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    def _save(state, ent, wm):
        if not ent:
            if state.exists:
                state.remove()
            return
        state.update((pickle.dumps(ent),))
        timers = [
            int(pend[4]) + JUMP_GAP_MS
            for _, pend in ent.values()
            if pend is not None
        ]
        if timers:
            state.setTimeoutTimestamp(max(wm, min(timers)))

    return (
        page.withWatermark(watermark_col, "2 seconds")
        .withColumn("__bucket", F.pmod(F.xxhash64(F.col("mid")), F.lit(n_buckets)))
        .groupBy("__bucket")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


N_UPSERT_BUCKETS = 16  # hash(key) % N partition dirs; a prod table sizes
# this so one bucket ~ a few GB (e.g. 4096 at 100 TB) — the constant only
# changes the directory fanout, never the semantics.


def bucket_of(keys: list[str], n_buckets: int = N_UPSERT_BUCKETS):
    """Bucket id column for a keyed upsert table: pmod(murmur3(keys), N).
    Deterministic per key, so every update for a key lands in the same
    partition directory forever."""
    return F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(n_buckets))


def read_upsert_table(spark, path: str) -> DataFrame:
    """Read a bucketed upsert table back WITHOUT the internal ``__bucket``
    partition column (``mergeSchema`` because a config-driven column add
    rewrites only touched buckets — untouched buckets keep the old file
    schema until their keys next update, the ALTER-then-UPSERT shape)."""
    return (
        spark.read.option("mergeSchema", "true").parquet(path).drop("__bucket")
    )


def upsert_sink(
    keys: list[str],
    order_col: str,
    path: str,
    n_buckets: int = N_UPSERT_BUCKETS,
):
    """K3 upsert-kafka-equivalent sink: per micro-batch, MERGE the batch
    into a keyed parquet table, keeping the row with the greatest
    ``order_col`` per key (last-writer-wins; ties go to the incoming batch).

    Returns a ``foreachBatch`` function. The table is stored partitioned
    by ``__bucket = hash(key) % n_buckets``; each micro-batch reads ONLY
    the buckets its keys hash into (partition pruning on the stored
    table), merges, and rewrites ONLY those partition directories via
    dynamic ``partitionOverwriteMode`` — untouched bucket dirs are never
    read nor rewritten (byte-identical across batches, asserted by
    ``test_upsert_sink_untouched_buckets_byte_identical``). Merge cost per
    batch is O(touched buckets), not O(table) — the parquet stand-in for a
    bucketed Delta ``MERGE INTO`` (reference sink contract: primary-keyed
    upsert, RT/app/dwd/DwdTradeOrderPreProcess.java:200-250;
    RT/utils/MyKafkaUtil.java:112-121).

    **Read isolation (the documented gap):** plain parquet has no
    snapshot isolation, so a reader that lists a touched bucket DURING
    the dynamic-overwrite commit window can observe a partially-rewritten
    directory — missing, duplicated, or mixed-generation rows for that
    bucket (untouched buckets are never perturbed; the torn window is
    per-touched-bucket and lasts only the directory swap).
    ``test_upsert_reader_during_inflight_rewrite`` pins the failure mode:
    the read is torn, not an error. The contract is single-writer +
    read-between-commits. :func:`upsert_sink_snapshot` is the
    snapshot-isolated twin (atomic manifest swap over immutable
    generation dirs — the commit protocol a Delta/Iceberg ``MERGE
    INTO`` would provide on the same ``__bucket`` layout); use it when
    concurrent readers must never observe a mid-commit state.
    """

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        from ..operators.dedup import keep_latest

        incoming = batch.withColumn("__gen", F.lit(batch_id + 1)).withColumn(
            "__bucket", bucket_of(keys, n_buckets)
        )
        if os.path.exists(path):
            # Bounded collect: <= n_buckets ints.
            touched = [
                r[0] for r in incoming.select("__bucket").distinct().collect()
            ]
            if not touched:
                return
            current = (
                spark.read.option("mergeSchema", "true")
                .parquet(path)
                .filter(F.col("__bucket").isin(touched))
                .withColumn("__gen", F.lit(0))
            )
            merged = keep_latest(
                current.unionByName(incoming, allowMissingColumns=True),
                keys,
                [order_col, "__gen"],
            )
        else:
            merged = keep_latest(incoming, keys, [order_col, "__gen"])
        # localCheckpoint materializes the merged buckets BEFORE the
        # dynamic overwrite touches the directories being read (Spark
        # refuses a lazy plan that reads the path it is overwriting).
        (
            merged.drop("__gen")
            .localCheckpoint()
            .repartition(F.col("__bucket"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__bucket")
            .parquet(path)
        )

    return fn


# --- snapshot-isolated upsert (manifest-swap commit protocol) ---------------

MANIFEST_NAME = "_MANIFEST.json"
MANIFESTS_DIR = "_manifests"  # archived per-version manifests (time travel)
COMMIT_LOCK_NAME = "_COMMIT.lock"
MAX_COMMIT_RETRIES = 3
VACUUM_RETAIN_VERSIONS = 3  # snapshots a default vacuum keeps readable
VACUUM_GRACE_S = 600.0  # reader lease: min seconds between tombstone & purge
TOMBSTONES_NAME = "_TOMBSTONES.json"  # gen dir -> first-seen-unreferenced ts


def _read_manifest(path: str) -> dict:
    return _read_manifest_versioned(path)[0]


def _read_manifest_versioned(path: str) -> tuple[dict, int]:
    """(bucket -> generation dir, manifest version). Version 0 for a
    missing manifest and for pre-r10 manifests written without the
    field; every commit bumps it — the optimistic-concurrency token the
    CAS commit section compares."""
    import json

    mpath = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mpath):
        return {}, 0
    with open(mpath) as f:
        doc = json.load(f)
    return (
        {int(k): v for k, v in doc["buckets"].items()},
        int(doc.get("version", 0)),
    )


class _PosixFS:
    """The MVCC commit protocol's ENTIRE filesystem contract (r12
    verdict #7 seam, made concrete in r13). Every metadata-plane
    filesystem touch — lock arbitration, manifest/tombstone swap,
    generation/manifest listing, physical delete — goes through these
    five operations; an object-store port swaps this ONE object
    (see SCALE.md "MVCC commit protocol: the POSIX boundary"):

    - ``create_exclusive``  -> S3/GCS conditional PUT (If-None-Match:*)
    - ``replace``           -> catalog pointer CAS / metastore swap
    - ``listdir``           -> LIST with prefix
    - ``unlink``            -> DELETE object
    - ``rmtree``            -> batched DELETE under prefix

    The data plane (parquet generation writes/reads) stays Spark's own
    Hadoop-FS path and needs no seam.
    """

    @staticmethod
    def create_exclusive(path: str, payload: str) -> None:
        """Create-if-absent with payload; raises FileExistsError when
        another creator won (the CAS primitive)."""
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, payload.encode())
        os.close(fd)

    @staticmethod
    def replace(src: str, dst: str) -> None:
        os.replace(src, dst)  # atomic on POSIX

    @staticmethod
    def listdir(path: str) -> list[str]:
        return os.listdir(path)

    @staticmethod
    def unlink(path: str) -> None:
        os.unlink(path)

    @staticmethod
    def rmtree(path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


_fs = _PosixFS()


def _acquire_commit_lock(path: str, timeout_s: float = 30.0) -> str:
    """Take the table's commit lock via ``_fs.create_exclusive`` — the
    portable CAS primitive (exactly-one creator wins; NFS-safe where
    plain flock is not). The lock guards only the SHORT commit section
    (re-read version, swap manifest), never the merge/write work, so
    writers stay parallel except for the few-ms critical section. A
    production lake format does the same arbitration with a conditional
    PUT on the object store (the ``_PosixFS`` seam maps each op)."""
    import time

    lock = os.path.join(path, COMMIT_LOCK_NAME)
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            _fs.create_exclusive(lock, str(os.getpid()))
            return lock
        except FileExistsError:
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"upsert commit lock held past {timeout_s}s: {lock} "
                    "(crashed writer? remove the lock file after confirming)"
                )
            time.sleep(0.05)


def _read_buckets(spark, path: str, manifest: dict, buckets) -> DataFrame | None:
    """Union of the manifest-resolved per-bucket dirs for ``buckets``,
    grouped per generation dir so partition inference sees a clean
    ``basePath/gen/__bucket=N`` layout (``__bucket`` column preserved).
    Bounded work: <= n_buckets path groups, schema merged across
    generations (the ALTER-then-UPSERT evolution shape). A pointer at
    a nonexistent ``__bucket=N`` dir (a pre-r12 manifest committed by
    a bucket-emptying delete) is treated as an empty bucket rather
    than raising PATH_NOT_FOUND — O(buckets) stat calls, bounded."""
    by_gen: dict[str, list[int]] = {}
    for b in buckets:
        if b in manifest and os.path.isdir(
            os.path.join(path, manifest[b], f"__bucket={b}")
        ):
            by_gen.setdefault(manifest[b], []).append(b)
    out = None
    for gen, bs in sorted(by_gen.items()):
        base = os.path.join(path, gen)
        part = (
            spark.read.option("mergeSchema", "true")
            .option("basePath", base)
            .parquet(*[os.path.join(base, f"__bucket={b}") for b in sorted(bs)])
        )
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )
    return out


def read_upsert_snapshot(
    spark, path: str, version: int | None = None
) -> DataFrame | None:
    """MVCC reader for :func:`upsert_sink_snapshot` tables: resolves the
    manifest ONCE, then reads exactly the generation directories it
    names — a commit that lands after the manifest read is invisible,
    so every read is a consistent snapshot (the property the plain
    dynamic-overwrite sink documents away).

    TIME TRAVEL (r10): pass ``version=N`` to read the table exactly as
    of its N-th commit — every commit archives its manifest under
    ``_manifests/vN.json`` (generation dirs are immutable, so an old
    manifest IS the old table). Raises if that version was never
    written or has been vacuumed past (:func:`vacuum_upsert_snapshot`
    retention)."""
    if version is None:
        manifest = _read_manifest(path)
    else:
        import json

        vpath = os.path.join(path, MANIFESTS_DIR, f"v{version}.json")
        if not os.path.exists(vpath):
            raise ValueError(
                f"snapshot version {version} not available at {path} "
                "(never committed, or vacuumed past the retention window)"
            )
        with open(vpath) as f:
            manifest = {
                int(k): v for k, v in json.load(f)["buckets"].items()
            }
    if not manifest:
        return None
    df = _read_buckets(spark, path, manifest, sorted(manifest))
    return None if df is None else df.drop("__bucket")


def upsert_sink_snapshot(
    keys: list[str],
    order_col: str,
    path: str,
    n_buckets: int = N_UPSERT_BUCKETS,
):
    """Snapshot-isolated twin of :func:`upsert_sink` — same bucketed
    O(touched) MERGE, but committed via an ATOMIC MANIFEST SWAP instead
    of overwriting partition directories in place (the mini-Delta commit
    protocol; at 100 TB you'd swap this file for a Delta/Iceberg commit
    log, keeping the identical layout):

    - data lives in immutable generation dirs
      ``gen-<batch>/__bucket=N/``; a batch WRITES new dirs for its
      touched buckets and never mutates existing files;
    - ``_MANIFEST.json`` maps bucket -> generation dir; the commit is
      one ``_fs.replace`` (atomic POSIX rename here; an HDFS rename or
      an S3 conditional put in production — every metadata-plane fs op
      routes through the :class:`_PosixFS` seam, the single object an
      object-store port swaps), so a reader resolves either the
      whole old snapshot or the whole new one — NEVER the torn
      mid-overwrite state ``test_upsert_reader_during_inflight_rewrite``
      pins for the plain sink;
    - untouched buckets keep their manifest pointer: zero IO, and old
      generations stay on disk serving in-flight readers until
      :func:`vacuum_upsert_snapshot` drops the unreferenced ones;
    - CONCURRENT WRITERS are arbitrated with optimistic concurrency
      (r10, replacing the old documented single-writer contract): the
      manifest carries a monotonically increasing ``version``; a writer
      merges and writes its generation dir lock-free, then enters the
      CAS commit section (``O_CREAT|O_EXCL`` lock file,
      :func:`_acquire_commit_lock`) where it RE-READS the version — if
      another commit landed since its merge began, the writer LOSES,
      releases the lock, and retries the whole merge against the fresh
      manifest (its orphaned generation dir is unreferenced and
      vacuumable), so a racing writer can never silently last-write-wins
      away the other's buckets. ``MAX_COMMIT_RETRIES`` exhaustion
      raises — never a quiet lost update. The two-writer interleave is
      pinned by ``test_upsert_snapshot_two_writer_race``.
    """

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        from ..operators.dedup import keep_latest

        incoming = batch.withColumn("__gen", F.lit(batch_id + 1)).withColumn(
            "__bucket", bucket_of(keys, n_buckets)
        )
        touched = [r[0] for r in incoming.select("__bucket").distinct().collect()]
        if not touched:
            return

        def build_merged(manifest: dict):
            # touched is manifest-independent here (it comes from the
            # incoming batch's own keys), so every attempt returns the
            # same list; the delete path, whose touched set depends on
            # the manifest, recomputes it per attempt.
            current = _read_buckets(spark, path, manifest, touched)
            if current is not None:
                return (
                    keep_latest(
                        current.withColumn("__gen", F.lit(0)).unionByName(
                            incoming, allowMissingColumns=True
                        ),
                        keys,
                        [order_col, "__gen"],
                    ).drop("__gen"),
                    touched,
                )
            return (
                keep_latest(incoming, keys, [order_col, "__gen"]).drop("__gen"),
                touched,
            )

        _commit_generation_cas(spark, path, str(batch_id), build_merged)

    return fn


def upsert_sink_snapshot_agg(
    keys: list[str],
    sum_cols: list[str],
    path: str,
    n_buckets: int = N_UPSERT_BUCKETS,
):
    """ADDITIVE MERGE sink (r11) — the counter-table primitive: per
    micro-batch, ``MERGE INTO table USING batch ON keys WHEN MATCHED
    UPDATE SET col = col + inc`` over the same bucketed
    immutable-generation MVCC layout as :func:`upsert_sink_snapshot`.
    Last-writer-wins cannot express this (a counter needs the OLD value;
    the online sketch/feature-count shape every streaming aggregation
    pipeline ends in), and unlike LWW the additive merge is NOT
    idempotent under at-least-once ``foreachBatch`` redelivery — so the
    manifest carries a ``last_batch`` watermark and a replayed batch id
    <= the committed one is skipped WHOLESALE. The guard is evaluated
    per CAS attempt against the then-current manifest (``skip_if``), so
    even a duplicate racing a concurrent commit cannot double-apply:
    the loser retries, re-reads, and skips. Requires monotonically
    increasing batch ids per table — exactly Spark's checkpointed
    foreachBatch contract.

    Per batch: one partial-combining pre-aggregation of the incoming
    rows (map-side combine to <= |keys| rows), then O(touched buckets)
    read + re-sum + fresh generation dir. State per table beyond the
    data: one integer in the manifest."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession

        inc = (
            batch.withColumn("__bucket", bucket_of(keys, n_buckets))
            .groupBy("__bucket", *keys)
            .agg(*[F.sum(c).alias(c) for c in sum_cols])
        )
        # Bounded collect: <= n_buckets ints.
        touched = [r[0] for r in inc.select("__bucket").distinct().collect()]
        if not touched:
            return

        def build_merged(manifest: dict):
            current = _read_buckets(
                spark, path, manifest, [b for b in touched if b in manifest]
            )
            both = (
                inc
                if current is None
                else current.select(inc.columns).unionByName(inc)
            )
            return (
                both.groupBy("__bucket", *keys).agg(
                    *[F.sum(c).alias(c) for c in sum_cols]
                ),
                touched,
            )

        _commit_generation_cas(
            spark,
            path,
            str(batch_id),
            build_merged,
            extra_meta={"last_batch": batch_id},
            skip_if=lambda doc: int(doc.get("last_batch", -1)) >= batch_id,
        )

    return fn


def _read_manifest_doc(path: str) -> dict:
    """The raw manifest document ({} if missing) — buckets + version +
    any sink-specific metadata (e.g. the additive sink's
    ``last_batch`` idempotence watermark)."""
    import json

    mpath = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mpath):
        return {}
    with open(mpath) as f:
        return json.load(f)


def _commit_generation_cas(
    spark,
    path: str,
    batch_tag: str,
    build_merged,
    extra_meta: dict | None = None,
    skip_if=None,
) -> bool:
    """The CAS commit section shared by the MERGE sink and the keyed
    DELETE: ``build_merged(manifest) -> (DataFrame with __bucket,
    touched bucket list)`` re-derives BOTH the merged view and the
    touched-bucket set from the CURRENT manifest on every attempt (a
    CAS loser's concurrent winner may have added manifest buckets the
    first attempt never saw — r11, per the advisor's retry-staleness
    note), writes the touched buckets to a fresh immutable generation
    dir, then commits under the O_EXCL lock iff the manifest version is
    unmoved — a loser re-merges from the fresh snapshot (orphaned gen
    dirs stay vacuumable); retry exhaustion raises, never a quiet lost
    update.

    ``skip_if(doc)`` (r11): an idempotence precondition evaluated
    against the manifest document at the start of EVERY attempt — if it
    returns True the commit is abandoned (returns False) without
    writing. The additive sink passes its replayed-batch guard here; a
    racing duplicate that commits between our merge and our lock bumps
    the version, we retry, and the precondition catches it on the
    re-read — a replay can never double-apply. ``extra_meta`` is merged
    into the committed document (unknown fields from the previous
    document are preserved). Returns True iff a commit landed."""
    import json
    import tempfile

    for attempt in range(MAX_COMMIT_RETRIES):
        doc0 = _read_manifest_doc(path)
        if skip_if is not None and skip_if(doc0):
            return False
        manifest = {int(k): v for k, v in doc0.get("buckets", {}).items()}
        version = int(doc0.get("version", 0))
        merged, touched = build_merged(manifest)
        if not touched:
            return False  # nothing this writer can affect exists
        gen_dir = (
            f"gen-{batch_tag}" if attempt == 0 else f"gen-{batch_tag}-r{attempt}"
        )
        if os.path.exists(os.path.join(path, gen_dir)):
            # NEVER overwrite an existing generation — they are immutable
            # by contract. This happens on crash-recovery replay of an
            # already-committed foreachBatch id (at-least-once delivery):
            # the old gen may still be referenced by archived manifests
            # and mid-scan readers, so the replay's re-merge goes to a
            # fresh dir and commits by manifest repoint like any other
            # write (the overwritten-in-place variant tore exactly like
            # the constant-tag delete bug this mirrors).
            from uuid import uuid4

            gen_dir = f"gen-{batch_tag}-rp{uuid4().hex[:8]}"
        (
            merged.localCheckpoint()
            .repartition(F.col("__bucket"))
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(os.path.join(path, gen_dir))
        )
        # partitionBy writes NO __bucket=N subdir for a bucket whose
        # merged output is empty (a delete that erased every row of a
        # touched bucket): repointing such a bucket would leave the
        # manifest referencing a nonexistent path and break every
        # subsequent read (r12 advisor fix). List what the write
        # actually produced (our own immutable dir — no race) and DROP
        # emptied buckets from the manifest instead of repointing them.
        written_buckets = {
            int(d.split("=", 1)[1])
            for d in _fs.listdir(os.path.join(path, gen_dir))
            if d.startswith("__bucket=")
        }
        lock = _acquire_commit_lock(path)
        try:
            _, cur_version = _read_manifest_versioned(path)
            if cur_version != version:
                # another writer committed since our merge read the
                # manifest: our merged view may be stale — lose,
                # release, re-merge from the fresh snapshot.
                continue
            for b in touched:
                if b in written_buckets:
                    manifest[b] = gen_dir
                else:
                    manifest.pop(b, None)  # bucket emptied by this commit
            doc = {
                k: v
                for k, v in doc0.items()
                if k not in ("version", "buckets")
            }  # preserve sink metadata fields across commits
            doc.update(
                version=version + 1,
                buckets={str(k): v for k, v in manifest.items()},
            )
            if extra_meta:
                doc.update(extra_meta)
            fd, tmp = tempfile.mkstemp(dir=path, suffix=".manifest")
            with os.fdopen(fd, "w") as f:
                json.dump(doc, f)
            # Archive the per-version manifest FIRST (time travel):
            # a crash between archive and swap leaves only an
            # unreferenced vN file — harmless; the reverse order
            # could commit a version that can never be time-traveled.
            os.makedirs(os.path.join(path, MANIFESTS_DIR), exist_ok=True)
            with open(
                os.path.join(path, MANIFESTS_DIR, f"v{version + 1}.json"),
                "w",
            ) as f:
                json.dump(doc, f)
            _fs.replace(tmp, os.path.join(path, MANIFEST_NAME))  # THE commit
            return True
        finally:
            _fs.unlink(lock)
    raise RuntimeError(
        f"snapshot commit: lost the manifest race "
        f"{MAX_COMMIT_RETRIES} times at {path} (batch {batch_tag}) — "
        "pathological writer contention; no partial state was committed"
    )


def delete_from_upsert_snapshot(
    spark,
    path: str,
    keys: list[str],
    keys_df: DataFrame,
    n_buckets: int = N_UPSERT_BUCKETS,
) -> int:
    """Keyed DELETE on the MVCC table (the right-to-be-forgotten
    primitive): anti-join the requested keys out of exactly their own
    buckets and commit a new generation through the same CAS section as
    the MERGE sink — O(touched buckets) IO, concurrent-writer safe, and
    snapshot-consistent for readers.

    Erasure nuance a real compliance pipeline must respect: the delete
    commits a NEW VERSION — time travel still reproduces pre-delete
    snapshots until :func:`vacuum_upsert_snapshot` retention drops
    them. TRUE erasure = delete + vacuum past every retained pre-delete
    version (pinned by ``test_upsert_snapshot_delete_and_purge``).

    ``keys_df`` values are CAST to the table's own key column types
    before hashing (murmur3 is type-dependent — the
    :func:`read_upsert_snapshot_lookup` lesson: a bigint probe against
    an int column silently selects the wrong bucket). The key types
    come from ONE manifest-resolved bucket dir (a parquet-footer read),
    never a full-table scan: key columns are hash-stable across
    generations by construction — evolved key types would break every
    reader's bucket routing, not just this probe.

    Returns the number of rows deleted, counted via a ``left_semi``
    over the touched buckets only — the whole call reads O(touched
    buckets), never O(table) (r11, replacing two full-table ``count()``
    scans). Each delete commits a FRESH uuid-tagged immutable
    generation dir (r11): a constant tag would let a second delete
    ``mode=overwrite`` a generation that archived manifests still
    reference, tearing time travel. The touched-bucket set is
    recomputed per CAS attempt against the then-current manifest, so a
    concurrent upsert landing a probed key in a new bucket between
    attempts cannot survive the delete silently.
    """
    from uuid import uuid4

    manifest0, _ = _read_manifest_versioned(path)
    if not manifest0:
        return 0
    # First bucket whose dir exists on disk (a pre-r12 manifest may
    # carry a dangling pointer from a bucket-emptying delete).
    b0 = next(
        (
            b
            for b in sorted(manifest0)
            if os.path.isdir(
                os.path.join(path, manifest0[b], f"__bucket={b}")
            )
        ),
        None,
    )
    if b0 is None:
        return 0  # every pointer dangles: the table is empty
    sample = spark.read.parquet(
        os.path.join(path, manifest0[b0], f"__bucket={b0}")
    )
    types = {f.name: f.dataType for f in sample.schema.fields}
    probe = keys_df.select(
        *[F.col(k).cast(types[k]).alias(k) for k in keys]
    ).distinct()
    # Bounded collect: <= n_buckets ints — every bucket a probe key CAN
    # hash to; fixed across CAS attempts (the probe itself never moves).
    probe_buckets = {
        r[0]
        for r in probe.withColumn("__bucket", bucket_of(keys, n_buckets))
        .select("__bucket")
        .distinct()
        .collect()
    }
    n_deleted = {"n": 0}

    def build_merged(manifest: dict):
        # Intersect against THIS attempt's manifest, not manifest0: a
        # concurrent writer may have added buckets since; and a probe
        # key hashing to a never-written bucket must not commit a
        # manifest pointer at an (empty) generation dir.
        touched = sorted(probe_buckets & set(manifest))
        if not touched:
            return None, []
        current = _read_buckets(spark, path, manifest, touched)
        n_deleted["n"] = current.join(probe, keys, "left_semi").count()
        return current.join(probe, keys, "left_anti"), touched

    _commit_generation_cas(
        spark, path, f"del-{uuid4().hex[:12]}", build_merged
    )
    return n_deleted["n"]


def export_upsert_snapshot(
    spark,
    path: str,
    out_dir: str,
    version: int | None = None,
    sort_by: str | None = None,
    n_files: int | None = None,
) -> dict:
    """Cross-format interop export (the handoff move real lakes do):
    materialize ONE committed MVCC snapshot to PLAIN parquet plus a
    JSON manifest (``_EXPORT.json``) so any engine without this
    module's manifest resolver — DuckDB, Trino, bare
    ``spark.read.parquet`` — reads exactly that version.

    Consistency is by construction, not by locking: the source manifest
    DOCUMENT is read ONCE — bucket map and version come from the same
    read (r12; two separate reads could label version-N data with a
    racing commit's N+1) — and generation dirs are immutable, so a
    writer committing mid-export changes nothing the export reads. The export is inherently O(table) — one
    distributed scan + write, nothing driver-side; the manifest's row
    count is a parquet-footer sum over the exported files (metadata
    read, no second data scan). Returns the manifest dict. Raises on a
    never-written table or an unavailable version (same contract as the
    reader).

    ZONE MAPS (r11): the live table is hash-bucketed on its key, so
    every bucket spans the full value range of every column — honest
    zone maps are impossible there by construction. The export is where
    clustering happens (Delta's OPTIMIZE move): ``sort_by`` range
    partitions + sorts the export on that column, producing files with
    DISJOINT value ranges, and the manifest records each file's
    [min, max] (read from the parquet footers — no extra data scan)
    under ``zone_maps``. Any engine can then skip non-overlapping files
    from the manifest alone; :func:`read_export_pruned` is the Spark
    reader that does. ``n_files`` sizes the range partitioning
    (default: the session's shuffle partitioning)."""
    import json

    if version is None:
        # Resolve buckets AND version from ONE manifest read — a commit
        # landing between two separate reads would label version-N data
        # as version N+1 in the export manifest (r12 advisor fix).
        mmap, version = _read_manifest_versioned(path)
        df = (
            None
            if not mmap
            else _read_buckets(spark, path, mmap, sorted(mmap))
        )
        df = None if df is None else df.drop("__bucket")
    else:
        # Explicit versions resolve via the immutable archived manifest
        # (_manifests/vN.json) — no race by construction.
        df = read_upsert_snapshot(spark, path, version)
    if df is None:
        raise ValueError(f"nothing to export: no committed snapshot at {path}")
    if sort_by is not None:
        df = (
            df.repartitionByRange(n_files, F.col(sort_by))
            if n_files
            else df.repartitionByRange(F.col(sort_by))
        ).sortWithinPartitions(sort_by)
    df.write.mode("overwrite").parquet(out_dir)
    files = sorted(
        f for f in _fs.listdir(out_dir) if f.endswith(".parquet")
    )
    # true footer-metadata sum (no Spark job, no column decode); O(files)
    # driver-side footer reads — bounded by the export's partitioning
    import pyarrow.parquet as pq

    n_rows = sum(
        pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
        for f in files
    )
    manifest = {
        "source_path": os.path.abspath(path),
        "source_version": version,
        "files": files,
        "n_rows": n_rows,
    }
    if sort_by is not None:
        manifest["zone_maps"] = {
            sort_by: _footer_zone_maps(out_dir, files, sort_by)
        }
    with open(os.path.join(out_dir, "_EXPORT.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def _footer_zone_maps(out_dir: str, files: list[str], col: str) -> dict:
    """Per-file [min, max] of ``col`` from parquet footer statistics —
    a metadata read (no row decode). Files whose footer carries no
    stats for the column map to None (readers must keep them)."""
    import pyarrow.parquet as pq

    zm: dict = {}
    for name in files:
        md = pq.ParquetFile(os.path.join(out_dir, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if col not in idx:
            zm[name] = None
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        zm[name] = None if lo is None else [lo, hi]
    return zm


def zonemap_candidates(manifest: dict, col: str, lo, hi) -> list[str]:
    """Files an export reader must touch for ``col BETWEEN lo AND hi``:
    those whose zone map overlaps the range, plus any without stats.
    Pure manifest arithmetic — no IO; the skipping decision any engine
    could make from ``_EXPORT.json`` alone."""
    zm = manifest.get("zone_maps", {}).get(col)
    if zm is None:
        return list(manifest["files"])  # no maps: full scan
    return sorted(
        name
        for name, rng in zm.items()
        if rng is None or not (hi < rng[0] or rng[1] < lo)
    )


def read_export_pruned(spark, out_dir: str, col: str, lo, hi) -> DataFrame:
    """Manifest-pruned range scan over a sorted export: select the
    overlapping files from the zone maps (driver-side manifest
    arithmetic over a bounded file list — no IO on skipped files), read
    ONLY those, and apply the residual filter (zone maps are
    file-granular; the predicate still trims inside boundary files). At
    100 TB this is the standard sorted-layout read: IO scales with the
    selected range, not the table."""
    import json

    with open(os.path.join(out_dir, "_EXPORT.json")) as f:
        manifest = json.load(f)
    keep = zonemap_candidates(manifest, col, lo, hi)
    if not keep:
        if not manifest["files"]:
            raise ValueError(
                f"export at {out_dir} holds no data files (empty snapshot "
                "was exported); no schema to shape an empty result"
            )
        # no overlapping file: empty frame with the export's schema
        any_file = os.path.join(out_dir, manifest["files"][0])
        return spark.read.parquet(any_file).filter(F.lit(False))
    return spark.read.parquet(
        *[os.path.join(out_dir, f) for f in keep]
    ).filter(F.col(col).between(lo, hi))


def vacuum_upsert_snapshot(
    path: str,
    retain_versions: int = VACUUM_RETAIN_VERSIONS,
    grace_s: float = VACUUM_GRACE_S,
) -> list[str]:
    """Retention-aware vacuum (the Delta VACUUM contract): keep every
    generation dir referenced by the CURRENT manifest or by any of the
    last ``retain_versions`` archived manifests — those snapshot
    versions stay time-travel-readable — and drop everything older.
    Archived manifests past retention are unlinked immediately, so a
    NEW ``read_upsert_snapshot(version=N)`` raises the clear
    not-available error rather than resolving a snapshot about to lose
    its data.

    READER LEASE (r11): a generation dir that falls out of retention is
    not removed on sight — it is first TOMBSTONED (``_TOMBSTONES.json``
    records when this vacuum first saw it unreferenced) and only
    deleted by a vacuum running at least ``grace_s`` seconds later.
    The lease contract this enforces: a reader that resolved a manifest
    while its version was still retained has ``grace_s`` seconds to
    finish scanning; within the lease its generation dirs cannot
    disappear mid-scan. A reader that outlives the lease FAILS LOUDLY —
    Spark's default ``spark.sql.files.ignoreMissingFiles=false`` turns
    the missing dir into an error, never a silently partial frame
    (pinned by ``test_vacuum_reader_lease``). This is exactly Delta's
    ``deletedFileRetentionDuration``: retention must exceed the longest
    reader, and ``grace_s=0`` (purge now — both phases in one call) is
    the explicit compliance override the erasure test uses. Returns the
    removed generation dir names.

    CONCURRENCY (r11, narrowed r12): the retention math, tombstone
    clocking, and expired-dir selection run under the table's commit
    lock — serialized against writers' commit sections (no listing a
    manifest mid-swap) and against other vacuums (the tombstone file is
    read-modify-write; two unserialized vacuums could lose each other's
    lease clocks). The ``rmtree`` of the selected dirs runs AFTER the
    lock is released (they are unreferenced and their tombstones were
    popped inside the lock, so no reader nor rival vacuum can reach
    them) — a long physical delete can no longer starve writers into
    the 30 s lock timeout. A writer's in-flight generation
    dir written BEFORE its commit is outside the lock and can be seen
    unreferenced here; the grace window is what protects it (it gets
    tombstoned, the writer commits, the next vacuum un-tombstones it as
    live) — one more reason ``grace_s=0`` is a stop-the-world
    compliance override, not a running-system default."""
    lock = _acquire_commit_lock(path)
    try:
        removed = _vacuum_locked(path, retain_versions, grace_s)
    finally:
        _fs.unlink(lock)
    # The rmtree runs OUTSIDE the lock (r12 advisor fix): deleting many
    # large generation dirs can exceed the 30 s lock timeout and fail
    # healthy concurrent writers with a misleading "crashed writer"
    # error. Safe unlocked: every dir in ``removed`` was tombstoned,
    # lease-expired, and unreferenced by any retained manifest when the
    # locked section popped its tombstone — no new reader can resolve
    # it. A crash here leaves the dir on disk untombstoned; the next
    # vacuum simply re-tombstones it and purges after a fresh lease.
    for d in removed:
        _fs.rmtree(os.path.join(path, d))
    return removed


def _vacuum_locked(path: str, retain_versions: int, grace_s: float) -> list[str]:
    """Locked phase of the vacuum: retention math, tombstone clocking,
    and selection of lease-expired dirs. Returns the dirs the CALLER
    must rmtree (after releasing the lock); their tombstones are popped
    here so a concurrent vacuum cannot double-select them."""
    import json
    import tempfile
    import time

    _, cur_version = _read_manifest_versioned(path)
    live = set(_read_manifest(path).values())
    floor = cur_version - retain_versions + 1
    mdir = os.path.join(path, MANIFESTS_DIR)
    if os.path.isdir(mdir):
        for m in sorted(_fs.listdir(mdir)):
            v = int(m[1:-5])  # v{N}.json
            mp = os.path.join(mdir, m)
            if v >= floor:
                with open(mp) as f:
                    live |= set(json.load(f)["buckets"].values())
            else:
                _fs.unlink(mp)
    tpath = os.path.join(path, TOMBSTONES_NAME)
    tombs: dict[str, float] = {}
    if os.path.exists(tpath):
        with open(tpath) as f:
            tombs = json.load(f)
    now = time.time()
    removed = []
    for d in sorted(_fs.listdir(path)):
        if not d.startswith("gen-"):
            continue
        if d in live:
            tombs.pop(d, None)  # re-referenced (defensive; shouldn't happen)
        elif d not in tombs and grace_s > 0:
            tombs[d] = now  # phase 1: start this dir's reader lease
        elif now - tombs.get(d, now) >= grace_s:
            tombs.pop(d, None)  # phase 2: lease expired — caller rmtrees
            removed.append(d)
    # Atomic tombstone commit (r12 advisor fix): mkstemp + os.replace,
    # matching the manifest commit — a crash mid-write must never leave
    # truncated JSON that fails every later vacuum at json.load.
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tombstones")
    with os.fdopen(fd, "w") as f:
        json.dump(tombs, f)
    _fs.replace(tmp, tpath)
    return removed


def _trunc_div(s: int, n: int) -> int:
    """Integer division truncating toward zero (Spark DIV / DuckDB //
    semantics; Python's // floors, which differs for negative sums)."""
    q = abs(s) // n
    return -q if s < 0 else q


def trailing_window_stream(
    df: DataFrame,
    window_sec: int,
    key: str = "user_id",
    ts_col: str = "ts_s",
    val_col: str = "v_micro",
    watermark_col: str = "rt",
    n_buckets: int = 256,
) -> DataFrame:
    """Watermark-correct ONLINE trailing time-window aggregate — the
    feature-store shape ("user's count/sum/mean over the last hour")
    as a keyed-state streaming operator with EXACT batch-RANGE-frame
    semantics:

    an event is emitted only once the watermark passes its timestamp,
    so every frame member (peers at the same second included — RANGE
    semantics) has provably arrived; the emitted aggregate therefore
    equals the batch ``value_trailing_window`` row-for-row, and the
    registry entry shares the batch entry's SQL oracle.

    State per key is two bounded buffers: ``hist`` — (ts, v) pairs
    inside the trailing window of any future event (pruned to
    ``watermark - window_sec`` on every call) — and ``pend`` — full
    rows newer than the watermark (bounded by one batch span plus the
    watermark delay). An event-time timeout set past the newest pending
    ts flushes keys that receive no further batches, and a final
    timeout at ``last_ts + window_sec`` self-cleans idle keys' state —
    the idle-TTL a 100 TB deployment needs so state tracks the ACTIVE
    key set, not the historical one.

    Bucketed grouping (r14 optimization round, same scheme as
    :func:`keep_latest_stream`): groups are hash buckets of ``key``; the
    pickled dict state maps key -> [hist, pend]. A bucket call processes
    EVERY key in the bucket with the current watermark — safe because
    emission readiness (``ts < watermark``) and the emitted frame are
    functions of (arrived rows, watermark) alone: a row's RANGE frame is
    complete the moment the watermark passes its timestamp (any later
    arrival with ts <= the row's ts would be dropped as late), so
    processing a key earlier than its per-key timer would have fired
    emits the same rows with the same aggregates. The bucket timer is
    the MIN of the per-key timers (max pending ts + 1, or the idle-TTL
    ``max hist ts + window + 1``).
    """
    import pickle

    out_fields = [f for f in df.schema.fields if f.name != watermark_col]
    out_schema = StructType(
        list(out_fields)
        + [
            StructField("trail_n", LongType()),
            StructField("trail_sum_micro", LongType()),
            StructField("trail_avg_micro", LongType()),
        ]
    )
    out_cols = [f.name for f in out_fields]
    state_schema = StructType([StructField("pending", BinaryType())])

    def fn(bucket_, pdfs: Iterator[pd.DataFrame], state: GroupState):
        ent = pickle.loads(bytes(state.get[0])) if state.exists else {}
        if not state.hasTimedOut:
            pdf = _sorted_concat(pdfs, [ts_col])
            if not pdf.empty:
                for rec in pdf[out_cols].to_dict("records"):
                    rec = {
                        k: (v.item() if hasattr(v, "item") else v)
                        for k, v in rec.items()
                    }
                    e = ent.get(rec[key])
                    if e is None:
                        ent[rec[key]] = e = [[], []]
                    e[1].append(rec)
        wm_s = state.getCurrentWatermarkMs() // 1000
        out = []
        drop = []
        for k, (hist, pend) in ent.items():
            pend.sort(key=lambda r: (r[ts_col], str(r)))
            ready = [r for r in pend if r[ts_col] < wm_s]
            pend = [r for r in pend if r[ts_col] >= wm_s]
            if ready:
                values = hist + [[r[ts_col], r[val_col]] for r in ready]
                for r in ready:
                    lo = r[ts_col] - window_sec
                    frame = [v for t, v in values if lo <= t <= r[ts_col]]
                    row = dict(r)
                    row["trail_n"] = len(frame)
                    row["trail_sum_micro"] = sum(frame)
                    row["trail_avg_micro"] = _trunc_div(sum(frame), len(frame))
                    out.append(row)
                hist = [tv for tv in values if tv[0] >= wm_s - window_sec]
            else:
                hist = [tv for tv in hist if tv[0] >= wm_s - window_sec]
            if pend or hist:
                ent[k] = [hist, pend]
            else:
                drop.append(k)
        for k in drop:
            del ent[k]
        if ent:
            state.update((pickle.dumps(ent),))
            tmr = min(
                (max(r[ts_col] for r in p) + 1)
                if p
                else (max(t for t, _ in h) + window_sec + 1)
                for h, p in ent.values()
            )
            state.setTimeoutTimestamp(
                max(state.getCurrentWatermarkMs(), tmr * 1000)
            )
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out)[[f.name for f in out_schema.fields]]

    return (
        df.withWatermark(watermark_col, "2 seconds")
        .withColumn(
            "__bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
        )
        .groupBy("__bucket")
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def read_upsert_snapshot_lookup(
    spark,
    path: str,
    keys: list[str],
    key_values: list,
    n_buckets: int = N_UPSERT_BUCKETS,
    version: int | None = None,
) -> DataFrame | None:
    """POINT LOOKUP on the MVCC table — the serving-path read: hash the
    requested key to its bucket (same murmur3 ``bucket_of`` the writer
    used, evaluated on a one-row literal frame so driver and executors
    can never disagree on the hash), resolve the manifest pointer for
    THAT bucket only, and scan one ``gen-*/__bucket=N`` directory —
    O(|table| / n_buckets) IO however large the table, the key-value-
    store access pattern on the same snapshot-isolated layout (an
    equality filter on the key columns is still applied for hash
    collisions within the bucket). ``version`` composes with time
    travel. Returns None for an empty table; a key that was never
    written yields an empty frame."""
    import json

    from pyspark.sql import Row

    if version is None:
        manifest = _read_manifest(path)
    else:
        vpath = os.path.join(path, MANIFESTS_DIR, f"v{version}.json")
        if not os.path.exists(vpath):
            raise ValueError(
                f"snapshot version {version} not available at {path}"
            )
        with open(vpath) as f:
            manifest = {int(k): v for k, v in json.load(f)["buckets"].items()}
    if not manifest:
        return None
    # murmur3 is TYPE-dependent (hash(5::int) != hash(5::bigint)), and
    # createDataFrame infers Python ints as bigint — cast the probe to
    # the TABLE's key types (one parquet footer read) or the bucket
    # would silently differ from the writer's.
    any_gen = os.path.join(path, next(iter(sorted(set(manifest.values())))))
    types = {
        f.name: f.dataType for f in spark.read.parquet(any_gen).schema.fields
    }
    probe = spark.createDataFrame(
        [Row(**dict(zip(keys, key_values)))]
    ).select(*[F.col(k).cast(types[k]).alias(k) for k in keys])
    bucket = probe.select(
        bucket_of(keys, n_buckets).alias("b")
    ).collect()[0].b
    df = _read_buckets(spark, path, manifest, [bucket])
    if df is None:
        # the key's bucket was never written: an empty frame in the
        # TABLE's schema (read above for the type cast), so callers can
        # union/select without special-casing the miss
        empty = spark.read.parquet(any_gen).limit(0)
        return empty.drop("__bucket") if "__bucket" in empty.columns else empty
    cond = None
    for k, v in zip(keys, key_values):
        c = F.col(k) == F.lit(v)
        cond = c if cond is None else cond & c
    return df.filter(cond).drop("__bucket")


def first_per_day_stream_tws(
    df: "DataFrame",
    key: str = "mid",
    dt_col: str = "dt",
    order: list[str] | None = None,
) -> "DataFrame":
    """D1 first-visit-per-day dedup on ``transformWithStateInPandas`` —
    Spark 4's arbitrary-stateful-processing API and the forward path for
    every operator this module implements on the older
    ``applyInPandasWithState`` (named state variables, native timers,
    per-state TTL instead of one blob + one query-wide timeout). Same
    semantics as :func:`first_per_day_stream`; the pytest gate proves
    the two APIs emit identical rows over the same replay, so migrating
    an operator is a mechanical swap, not a semantics review.

    State here is ONE ValueState holding the key's last-seen date — the
    same single-cell bound as the old form (RocksDB-backed, keyed by
    the dedup key), so the 100 TB posture is unchanged.

    Runtime dependency: the transformWithState state-server protocol
    speaks protobuf between the JVM and the Python worker; environments
    without ``google.protobuf`` (this sandbox) fail at stream start with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — the parity gate
    (test_transform_with_state_matches_apply_in_pandas_with_state)
    importorskips on it. Any real cluster ships protobuf.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    order = order or ["ts", "event_id"]
    out_schema = df.schema

    class FirstPerDay(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last_dt", "last_dt string")

        def handleInputRows(self, key_, rows, timerValues):
            pdf = _sorted_concat(rows, order)
            if pdf.empty:
                return
            last_dt = self._last.get()[0] if self._last.exists() else None
            keep = []
            for i, row_dt in enumerate(pdf[dt_col]):
                if row_dt != last_dt:
                    keep.append(i)
                    last_dt = row_dt
            self._last.update((last_dt,))
            yield pdf.iloc[keep]

        def close(self) -> None:
            pass

    return df.groupBy(key).transformWithStateInPandas(
        FirstPerDay(), out_schema, "append", "None"
    )


def keep_latest_stream_tws(
    df: "DataFrame",
    keys: list[str],
    order_col: str,
    watermark_col: str = "rt",
) -> "DataFrame":
    """D4/W6 keep-latest + 5 s debounce on ``transformWithStateInPandas``
    — the JVM-managed-state port of :func:`keep_latest_stream` (reference
    timers: RT/app/dws/DwsTradePaymentSucWindow.java:102,
    RT/app/dws/DwsTradeProvinceOrderWindow.java:102-103) and the
    scale-path answer to the replay lane's one `weak`: the old API holds
    state as one JSON blob and re-enters Python for every (key,
    micro-batch) pair through a query-wide timeout mode, while this form
    keeps the buffered row in a typed ValueState and fires NATIVE
    per-key event-time timers (``handle.registerTimer``), so state
    bookkeeping stays JVM-side and Python is entered only for keys with
    actual input rows or an expired timer.

    Semantics are identical to :func:`keep_latest_stream` by
    construction (same anchor/burst/emit rules; the parity gate
    ``test_keep_latest_tws_matches_apply_in_pandas_with_state`` proves
    row-identical output over the same replay). Timer rules mirrored:
    the FIRST row of a burst anchors a timer at ``anchor + 5 s``; newer
    rows inside the window replace the buffered row without moving the
    timer; a row past the window closes the burst in-stream, emits the
    survivor, and re-anchors (deleting the stale timer so the old
    firing cannot double-emit).

    Runtime dependency: protobuf (the transformWithState state-server
    protocol) — absent in this sandbox, present on any real cluster;
    the parity test importorskips exactly like the D1 port above.
    """
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    out_schema = df.drop(watermark_col).schema
    out_cols = [f.name for f in out_schema.fields]
    state_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in out_schema.fields
    )

    class KeepLatestDebounce(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._best = handle.getValueState("best", state_ddl)
            self._anchor = handle.getValueState("anchor", "anchor_ms long")

        def handleInputRows(self, key_, rows, timerValues: TimerValues):
            pdf = _sorted_concat(rows, [order_col])
            if pdf.empty:
                return
            best = anchor = None
            if self._anchor.exists():
                anchor = self._anchor.get()[0]
                best = dict(zip(out_cols, self._best.get()))
            done = []
            for row in pdf[out_cols].to_dict("records"):
                row_ms = int(row[order_col]) * 1000
                if best is None:
                    best, anchor = row, row_ms
                    self._handle.registerTimer(anchor + DEBOUNCE_MS)
                elif row_ms - anchor > DEBOUNCE_MS:
                    done.append(best)  # burst closed in-stream
                    self._handle.deleteTimer(anchor + DEBOUNCE_MS)
                    best, anchor = row, row_ms
                    self._handle.registerTimer(anchor + DEBOUNCE_MS)
                elif row[order_col] >= best[order_col]:
                    best = row  # replace inside the window; timer stays
            self._best.update(tuple(best[c] for c in out_cols))
            self._anchor.update((anchor,))
            if done:
                yield pd.DataFrame(done)[out_cols]

        def handleExpiredTimer(
            self, key_, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            if self._anchor.exists():
                # a re-anchor deletes its stale timer, so any firing
                # timer IS the live burst's — emit and clear.
                best = dict(zip(out_cols, self._best.get()))
                self._best.clear()
                self._anchor.clear()
                yield pd.DataFrame([best])[out_cols]

        def close(self) -> None:
            pass

    return (
        df.withWatermark(watermark_col, "2 seconds")
        .groupBy(*keys)
        .transformWithStateInPandas(
            KeepLatestDebounce(), out_schema, "append", "EventTime"
        )
    )
