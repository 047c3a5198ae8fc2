"""Oracle parity for the trade-domain DWD join pipelines."""

from __future__ import annotations

import pytest

from flink_realtime_datawarehouse_v3_spark import api

from .conftest import SF_SMOKE, assert_parity

TRADE = [
    "dwd_trade_order_pre_process",
    "dwd_trade_order_detail",
    "dwd_trade_cancel_detail",
    "dwd_trade_cart_add",
    "dwd_trade_pay_detail_suc",
    "dwd_trade_order_refund",
    "dwd_trade_refund_pay_suc",
]


@pytest.mark.parametrize("name", TRADE)
def test_parity(spark, duck, name):
    df = api.QUERIES[name](spark, SF_SMOKE)
    assert_parity(df, duck, api.ORACLES[name], name)
