"""Oracle parity for the single-table DWD CDC pipelines."""

from __future__ import annotations

import pytest

from flink_realtime_datawarehouse_v3_spark import api

from .conftest import SF_SMOKE, assert_parity

SIMPLE = [
    "dwd_user_register",
    "dwd_tool_coupon_get",
    "dwd_tool_coupon_order",
    "dwd_tool_coupon_pay",
    "dwd_interaction_favor_add",
    "dwd_interaction_comment",
]


@pytest.mark.parametrize("name", SIMPLE)
def test_parity(spark, duck, name):
    df = api.QUERIES[name](spark, SF_SMOKE)
    assert_parity(df, duck, api.ORACLES[name], name)
