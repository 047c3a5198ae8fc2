"""Unit + parity tests for the round-4 analytics operators: schema-evolving
DIM routing, as-of join, sessionization, rollup, decontamination."""

from __future__ import annotations

import datetime as dt
import pytest

from pyspark.sql import functions as F

from flink_realtime_datawarehouse_v3_spark import api
from flink_realtime_datawarehouse_v3_spark.plans import dim as dim_plan
from flink_realtime_datawarehouse_v3_spark.sources import cdc

from .conftest import SF_SMOKE, assert_parity


def test_dim_evolve_parity(spark, duck):
    df = api.QUERIES["dim_user_info_schema_evolve"](spark, SF_SMOKE)
    assert_parity(df, duck, api.ORACLES["dim_user_info_schema_evolve"], "dim_evolve")


def test_dim_evolve_era_split(spark):
    """Rows routed before the v2 config's effective_ts must carry NULL in
    the added column; rows from the v2 era must carry the payload value —
    and both eras must be non-empty (the fixture straddles the boundary)."""
    eff = dim_plan.USER_INFO_EVOLUTION[1].effective_ts
    src = cdc.topic_db_parsed(spark, SF_SMOKE, only=["user_info"])
    routed = dim_plan.route_evolving(src, dim_plan.USER_INFO_EVOLUTION)
    ts_by_id = {
        r["id"]: int(r["ts"])
        for r in src.select(F.col("data").getItem("id").alias("id"), "ts").collect()
    }
    n_pre = n_post = 0
    for r in routed.collect():
        if ts_by_id[r["id"]] < eff:
            assert r["phone_num"] is None
            n_pre += 1
        else:
            assert r["phone_num"] is not None
            n_post += 1
    assert n_pre > 0 and n_post > 0


def test_dim_evolve_merged_schema_order(spark):
    routed = dim_plan.route_evolving(
        cdc.topic_db_parsed(spark, SF_SMOKE, only=["user_info"]),
        dim_plan.USER_INFO_EVOLUTION,
    )
    # v1 columns first, then v2's addition at its first-appearance position.
    assert routed.columns == ["id", "name", "create_time", "phone_num"]


def test_asof_null_when_no_prior_view(spark):
    """A click before any view of the same user must surface with a NULL
    view side (left semantics), and matched rows must have lag_ms >= 0."""
    rows = api.QUERIES["asof_join_events"](spark, SF_SMOKE).collect()
    assert rows, "no clicks in fixture?"
    assert all(r["lag_ms"] is None or r["lag_ms"] >= 0 for r in rows)


def test_session_window_boundary_merges(spark):
    """Events exactly GAP apart merge into one session (Spark's strict
    close-at->gap rule the oracle mirrors); one microsecond past the gap
    splits."""
    from flink_realtime_datawarehouse_v3_spark.operators.sessionize import (
        GAP_MS,
        session_stats,
    )

    t0 = dt.datetime(2024, 1, 1)
    gap = dt.timedelta(milliseconds=GAP_MS)
    e = spark.createDataFrame(
        [
            (1, t0, 1.0),
            (1, t0 + gap, 1.0),  # exactly at the boundary -> merges
            (1, t0 + gap * 2 + dt.timedelta(milliseconds=1), 1.0),  # splits
        ],
        "user_id int, ts timestamp, value double",
    )
    out = sorted(
        session_stats(e).collect(), key=lambda r: r["session_start_ms"]
    )
    assert [r["n_events"] for r in out] == [2, 1]
    assert out[0]["session_end_ms"] - out[0]["session_start_ms"] == 2 * GAP_MS


def test_rollup_levels_consistent(spark):
    """The rollup's per-province level must re-aggregate exactly from the
    leaf level for the additive measure, and the grand total row must be
    unique with level 3."""
    df = api.QUERIES["dws_trade_province_source_rollup"](spark, SF_SMOKE).collect()
    leaves = [r for r in df if r["level"] == 0]
    prov = {r["province_name"]: r for r in df if r["level"] == 1}
    total = [r for r in df if r["level"] == 3]
    assert len(total) == 1 and total[0]["province_name"] is None
    by_prov: dict[str, float] = {}
    for r in leaves:
        by_prov[r["province_name"]] = by_prov.get(r["province_name"], 0.0) + r["order_amount"]
    for p, amt in by_prov.items():
        assert abs(prov[p]["order_amount"] - amt) < 1e-6


def test_decontaminate_flags_exact_dup_of_benchmark(spark):
    """The exact-duplicate twin (doc_id + 1_000_000) of a benchmark doc
    shares every shingle with it -> must be flagged contaminated; and no
    benchmark doc appears among the candidates."""
    rows = {r["doc_id"]: r for r in
            api.QUERIES["decontaminate_ngram"](spark, SF_SMOKE).collect()}
    from flink_realtime_datawarehouse_v3_spark.operators.text_dedup import BENCH_MOD

    assert all(
        not (d % BENCH_MOD == 0 and d < 1_000_000) for d in rows
    )
    # doc 0 is benchmark (0 % 97 == 0) and has an exact twin at 1_000_000.
    twin = rows.get(1_000_000)
    assert twin is not None and twin["contaminated"] == 1 and twin["n_overlap"] > 0
    assert any(r["contaminated"] == 0 for r in rows.values())


def test_scd2_intervals_partition_history(spark):
    """SCD2 contract: versions per id are 1..n in start_ts order, each
    end_ts equals the next version's start_ts (half-open chain), exactly
    one current row per id, and the current row is the SCD1 dim row."""
    from flink_realtime_datawarehouse_v3_spark import api

    rows = api.QUERIES["dim_coupon_use_scd2"](spark, SF_SMOKE).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert by_id
    for vid, versions in by_id.items():
        versions.sort(key=lambda r: r.version)
        assert [v.version for v in versions] == list(range(1, len(versions) + 1))
        for a, b in zip(versions, versions[1:]):
            assert a.end_ts == b.start_ts and a.is_current == 0
        assert versions[-1].is_current == 1 and versions[-1].end_ts is None
    scd1 = {r.id: r for r in api.QUERIES["dim_coupon_use"](spark, SF_SMOKE).collect()}
    assert set(scd1) == set(by_id)
    for vid, versions in by_id.items():
        cur = versions[-1]
        assert (cur.coupon_status, cur.used_time) == (
            scd1[vid].coupon_status, scd1[vid].used_time
        )


def test_temporal_join_picks_pre_pay_version(spark):
    """As-of (pay_ts - 1) must always resolve to the used-but-unpaid
    version: coupon_status 1402, used_time still NULL, version = n-1."""
    from flink_realtime_datawarehouse_v3_spark import api

    rows = api.QUERIES["temporal_join_coupon_asof"](spark, SF_SMOKE).collect()
    assert rows
    history = {}
    for r in api.QUERIES["dim_coupon_use_scd2"](spark, SF_SMOKE).collect():
        history[r.id] = max(history.get(r.id, 0), r.version)
    for r in rows:
        assert r.coupon_status == "1402"
        assert r.used_time is None and r.using_time is not None
        assert r.version == history[r.id] - 1


@pytest.mark.parametrize(
    "name",
    [
        "dim_coupon_use_scd2",        # window over (pk, ts) — ts unique per pk
        "events_running_total",       # frame over (ts, event_id) — unique
        "text_quality_top_fraction",  # percent_rank w/ doc_id tie-break
        "session_funnel",             # gap-merge agg
        "skew_heavy_hitters",         # top-k with total (count, key) order
    ],
)
def test_r4_entries_stable_across_partitioning(spark, name):
    """Round-4 rank/window entries order by total keys, so results are
    identical under different shuffle-partition counts."""
    from flink_realtime_datawarehouse_v3_spark import api

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted(map(str, api.QUERIES[name](spark, SF_SMOKE).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(map(str, api.QUERIES[name](spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert a == b


def test_cms_heavy_hitters_one_sided_and_ranks(spark):
    """r11 count-min sketch: (a) one-sided error — est_cnt >= true_cnt
    for EVERY key, never an undercount (min over d counters each of
    which holds the key's own mass plus nonnegative collision mass);
    (b) a planted heavy key dominates the top-k by its true mass even
    through collisions; (c) the counter table the estimate broadcasts
    is exactly d*w slots at most — the bounded-state contract that
    makes the sketch a fixed-size object at any corpus size."""
    from flink_realtime_datawarehouse_v3_spark.operators import analytics

    base = [(i % 97, ) for i in range(3000)]  # 97 keys, ~31 events each
    heavy = [(424242,)] * 800  # planted hot key
    events = spark.createDataFrame(base + heavy, "user_id long").select(
        F.col("user_id"),
        F.lit("e").alias("event_type"),
    )
    # full estimate table (not just top-k): rebuild the inner frame
    topk = analytics.heavy_hitters_cms(events, k=98).collect()
    assert len(topk) == 98
    for r in topk:
        assert r.est_cnt >= r.true_cnt, (r.user_id, r.est_cnt, r.true_cnt)
    assert topk[0].user_id == 424242 and topk[0].true_cnt == 800
    # bounded sketch: d*w is the whole state regardless of corpus size
    d, w = len(analytics.CMS_HASHES), analytics.CMS_W
    assert d * w == 4096
