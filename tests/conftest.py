"""Shared fixtures: one SparkSession per test session + DuckDB oracle."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_realtime_datawarehouse_v3_spark.session import get_spark  # noqa: E402
from flink_realtime_datawarehouse_v3_spark.sources.tables import TABLE_NAMES  # noqa: E402

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMOKE}/{name}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def normalize(cols, rows):
    """Sort columns by name, stringify cells, sort rows — the driver's
    order-insensitive comparison, approximated."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple("" if x is None else x for x in t))
    return [cols[i] for i in order], out


def _dtype_class(series) -> str:
    """The driver's dtype-sensitivity class (mirrors tools/check_all.py):
    int64 vs float64 vs Decimal-object columns hash differently there even
    when their stringified values agree — e.g. DuckDB sum(BIGINT) returns
    HUGEINT, which pandas maps away from int64."""
    import decimal

    import numpy as np
    import pandas as pd

    if pd.api.types.is_integer_dtype(series):
        return "int"
    if pd.api.types.is_float_dtype(series):
        return "float"
    if pd.api.types.is_bool_dtype(series):
        return "bool"
    for v in series:
        if v is None:
            continue
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (list, np.ndarray)):
            return "array"
        break
    return "other"


def assert_parity(spark_df, duck_con, oracle_sql, name=""):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d = duck_con.execute(oracle_sql)
    d_cols = [c[0] for c in d.description]
    d_rows = [tuple(r) for r in d.fetchall()]
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    # Dtype sensitivity, like the driver (the value comparison below
    # stringifies and would miss e.g. a HUGEINT-vs-bigint sum).
    spdf = spark_df.toPandas()
    odf = duck_con.execute(oracle_sql).df()
    bad = [
        f"{c}: spark={_dtype_class(spdf[c])} oracle={_dtype_class(odf[c])}"
        for c in sorted(set(spdf.columns) & set(odf.columns))
        if _dtype_class(spdf[c]) != _dtype_class(odf[c])
    ]
    assert not bad, f"{name}: dtype-class mismatch {bad}"
    _, s_norm = normalize(s_cols, s_rows)
    _, d_norm = normalize(d_cols, d_rows)
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count spark={len(s_norm)} duck={len(d_norm)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
