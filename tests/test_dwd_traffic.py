"""Oracle parity for the traffic (app-log) DWD pipelines."""

from __future__ import annotations

import pytest

from flink_realtime_datawarehouse_v3_spark import api

from .conftest import SF_SMOKE, assert_parity

TRAFFIC = [
    "dwd_traffic_page_log",
    "dwd_traffic_start_log",
    "dwd_traffic_error_log",
    "dwd_traffic_display_log",
    "dwd_traffic_action_log",
    "dwd_traffic_unique_visitor_detail",
    "dwd_traffic_user_jump_detail",
]


@pytest.mark.parametrize("name", TRAFFIC)
def test_parity(spark, duck, name):
    df = api.QUERIES[name](spark, SF_SMOKE)
    assert_parity(df, duck, api.ORACLES[name], name)


def test_dirty_side_output(spark, duck):
    """P2/W7: clean + dirty partitions the raw topic exactly (reference
    OutputTag split, RT/app/dwd/BaseLogApp.java:54-69)."""
    from flink_realtime_datawarehouse_v3_spark.sources import logs

    raw = logs.topic_log_json(spark, SF_SMOKE)
    clean = logs.parse_topic_log(raw)
    dirty = api.QUERIES["dwd_traffic_dirty_log"](spark, SF_SMOKE)
    assert clean.count() + dirty.count() == raw.count()
    assert dirty.count() > 0  # non-vacuous: synthesized dirty rows exist
    assert_parity(
        dirty, duck, api.ORACLES["dwd_traffic_dirty_log"], "dwd_traffic_dirty_log"
    )
