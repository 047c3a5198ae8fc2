"""Oracle parity for the 11 DWS windowed-aggregation pipelines."""

from __future__ import annotations

import pytest

from flink_realtime_datawarehouse_v3_spark import api

from .conftest import SF_SMOKE, assert_parity

DWS = [n for n in api.QUERIES if n.startswith("dws_")]


def test_count():
    assert len(DWS) == 11


@pytest.mark.parametrize("name", DWS)
def test_parity(spark, duck, name):
    df = api.QUERIES[name](spark, SF_SMOKE)
    assert_parity(df, duck, api.ORACLES[name], name)
