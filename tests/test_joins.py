"""Oracle parity for the join-shape operators (SURVEY.md J7/J8)."""

from __future__ import annotations

import pytest

from flink_realtime_datawarehouse_v3_spark import api

from .conftest import SF_SMOKE, assert_parity


@pytest.mark.parametrize(
    "name", ["interval_join_events", "join_activity_coupon_full_outer"]
)
def test_parity(spark, duck, name):
    df = api.QUERIES[name](spark, SF_SMOKE)
    assert_parity(df, duck, api.ORACLES[name], name)


def test_interval_join_non_vacuous(spark):
    assert api.QUERIES["interval_join_events"](spark, SF_SMOKE).count() > 0
