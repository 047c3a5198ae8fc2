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
