"""Oracle parity for the 11 DWS windowed-aggregation pipelines."""

from __future__ import annotations

import pytest

from flink_realtime_datawarehouse_v3_spark import api

from .conftest import SF_SMOKE, assert_parity

# The oracle-checked DWS window set (the approx A5 variant is rows-only
# by design and gated by its own tolerance test below).
DWS = [n for n in api.QUERIES if n.startswith("dws_") and n in api.ORACLES]


def test_count():
    # 12 warehouse windows + the CJK keyword window + the SQL-UDTF form
    # + the r10 changelog retract aggregate
    assert len(DWS) == 15


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


def test_keyword_window_segmenter_swap(spark):
    """U1 plug point: swapping the Catalyst tokenizer for the Arrow-batched
    Pandas UDF (same whitespace semantics) must not change the window
    result — proving a real segmenter (IK/jieba-style) drops in without
    touching the pipeline."""
    from flink_realtime_datawarehouse_v3_spark.functions.tokenize import (
        tokenize_pandas_udf,
    )
    from flink_realtime_datawarehouse_v3_spark.plans import dws

    page = api.QUERIES["dwd_traffic_page_log"](spark, SF_SMOKE)
    catalyst = dws.traffic_source_keyword_page_view_window(page)
    swapped = dws.traffic_source_keyword_page_view_window(
        page, segmenter=tokenize_pandas_udf
    )
    assert "ArrowEvalPython" in (
        swapped._jdf.queryExecution().executedPlan().toString()
    ), "pandas segmenter did not reach the plan"
    a = sorted(map(str, catalyst.collect()))
    b = sorted(map(str, swapped.collect()))
    assert a == b


def test_bpe_segmenter_deterministic_subwords(spark):
    """The BPE-ish segmenter is real greedy-merge inference: known merges
    fire in priority order, punctuation splits off, digits stay whole, and
    the full keyword window accepts it through the same parameter."""
    from pyspark.sql import functions as F

    from flink_realtime_datawarehouse_v3_spark.functions.tokenize import (
        segment_bpe_pandas_udf,
    )
    from flink_realtime_datawarehouse_v3_spark.plans import dws

    df = spark.createDataFrame(
        [("The thinking 42 re-start!",), (None,)], "item string"
    )
    (got,), (none_row,) = (
        df.select(segment_bpe_pandas_udf(F.col("item")).alias("t")).collect()
    )
    # 'the' <- (t,h)+(th,e); 'thinking' -> th+in+k+ing via (i,n)+(in,g);
    # 're' single merge; 'start' -> st+a+r+t via (s,t); digits/punct intact.
    assert got == [
        "the", "th", "in", "k", "ing", "42", "re", "-", "st", "a", "r", "t", "!",
    ]
    assert none_row == []

    page = api.QUERIES["dwd_traffic_page_log"](spark, SF_SMOKE)
    out = dws.traffic_source_keyword_page_view_window(
        page, segmenter=segment_bpe_pandas_udf
    )
    assert out.count() > 0


def test_keyword_window_udtf_sql(spark, duck):
    """The SQL-LATERAL UDTF form must hash-match the keyword-window oracle
    and actually plan through the Arrow Python UDTF node."""
    from .conftest import assert_parity

    df = api.QUERIES["dws_keyword_window_udtf_sql"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan, plan
    assert_parity(
        df, duck,
        api.ORACLES["dws_keyword_window_udtf_sql"],
        "dws_keyword_window_udtf_sql",
    )


def test_cjk_segmenter_fmm(spark, duck):
    """Dictionary FMM segmentation: greedy longest match, single-char
    fallback for out-of-dictionary chars, and oracle parity for the full
    CJK keyword window (the oracle recomputes segmentation via a recursive
    longest-prefix CTE — independent of the Python implementation)."""
    from pyspark.sql import functions as F

    from flink_realtime_datawarehouse_v3_spark.functions.tokenize import (
        segment_cjk_pandas_udf,
    )

    df = spark.createDataFrame(
        [("实时数据仓库",), ("数据湖实时分析",), (None,)], "item string"
    )
    rows = df.select(segment_cjk_pandas_udf(F.col("item")).alias("t")).collect()
    assert rows[0].t == ["实时", "数据仓库"]  # longest match beats 数据+仓库
    assert rows[1].t == ["数据", "湖", "实时", "分析"]  # 湖 = fallback
    assert rows[2].t == []
    assert_parity(
        api.QUERIES["dws_traffic_keyword_cjk_window"](spark, SF_SMOKE),
        duck,
        api.ORACLES["dws_traffic_keyword_cjk_window"],
        "dws_traffic_keyword_cjk_window",
    )


@pytest.mark.parametrize(
    "name",
    [
        # keep_first on (create_time, activity_rule_id, coupon_id)
        "dws_trade_order_window",
        # keep_latest on (callback_time, payment_type_code) — the payment
        # changelog path
        "dws_trade_payment_suc_window",
        # keep_latest inside the province window's detail dedup
        "dws_trade_province_order_window",
    ],
)
def test_dedup_tiebreak_stable_across_partitioning(spark, name):
    """The keep_first/keep_latest call sites order by a real changelog
    discriminator (e.g. create_time, activity_rule_id, coupon_id) — never
    the partition key — so the deduped result (and everything downstream)
    is identical under different shuffle-partition counts."""
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted(map(str, api.QUERIES[name](spark, SF_SMOKE).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(map(str, api.QUERIES[name](spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert a == b


def test_retract_fold_equals_latest_state_random_chains(spark):
    """Seeded-random soundness of the changelog delta algebra: for 200
    keys with random status-update chains (insert + 0..4 updates, each
    update's ``old`` carrying the prior status ONLY when it changed —
    the Maxwell envelope contract — and a quarter of the keys ending in
    a delete carrying the full final image), folding the +/-1 deltas
    must equal counting the LATEST surviving state per key, for every
    (province, status) group. One Spark run, pure-Python reference."""
    import random

    from pyspark.sql import functions as F

    from flink_realtime_datawarehouse_v3_spark.plans import dws

    rng = random.Random(42)
    statuses = ["1001", "1002", "1003", "1004", "1005", "1006"]
    rows, latest = [], {}
    for key in range(200):
        prov = str(rng.randrange(8))
        cur = "1001"
        rows.append(("order_info", "insert", {"province_id": prov,
                                              "order_status": cur}, None))
        for _ in range(rng.randrange(5)):
            new = rng.choice(statuses)
            rows.append(
                ("order_info", "update",
                 {"province_id": prov, "order_status": new},
                 {"order_status": cur} if new != cur else {"operate_time": "x"})
            )
            cur = new
        if rng.randrange(4) == 0:
            rows.append(
                ("order_info", "delete",
                 {"province_id": prov, "order_status": cur}, None)
            )
            continue  # deleted rows leave the table: no latest state
        latest[key] = (prov, cur)
    rng.shuffle(rows)  # arrival order must not matter (SUM commutes)
    ev = spark.createDataFrame(
        rows,
        "table string, type string, data map<string,string>, "
        "old map<string,string>",
    )
    got = {
        (r.province_id, r.order_status): r.n_orders
        for r in dws.order_status_counts_from_deltas(
            dws.order_status_count_deltas(ev)
        ).collect()
    }
    want: dict = {}
    for prov, status in latest.values():
        k = (int(prov), status)
        want[k] = want.get(k, 0) + 1
    assert got == want
