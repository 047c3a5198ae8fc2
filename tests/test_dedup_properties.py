"""Property-based checks for the D1-D4 dedup operators.

Hypothesis generates small random changelogs (duplicate keys, ties on the
order column, nulls) and asserts the Spark operators against a plain
pandas reference model — the invariants hold for ANY input, not just the
driver fixtures. Derandomized + bounded so the suite stays fast.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_realtime_datawarehouse_v3_spark.operators import dedup

ROWS = st.lists(
    st.tuples(
        st.integers(0, 5),            # key
        st.integers(0, 3),            # order value (collisions likely)
        st.integers(0, 9),            # discriminator
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    pdf = pd.DataFrame(
        [(k, o, d, i) for i, (k, o, d) in enumerate(rows)],
        columns=["k", "o", "d", "rid"],
    )
    return spark.createDataFrame(pdf), pdf


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_keep_first_matches_pandas_model(spark, rows):
    df, pdf = _df(spark, rows)
    got = {
        (r.k, r.o, r.d, r.rid)
        for r in dedup.keep_first(df, ["k"], ["o", "d", "rid"]).collect()
    }
    want = {
        tuple(g.sort_values(["o", "d", "rid"]).iloc[0])
        for _, g in pdf.groupby("k")
    }
    assert got == want


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_keep_latest_matches_pandas_model(spark, rows):
    df, pdf = _df(spark, rows)
    got = {
        (r.k, r.o, r.d, r.rid)
        for r in dedup.keep_latest(df, ["k"], ["o", "d", "rid"]).collect()
    }
    want = {
        tuple(g.sort_values(["o", "d", "rid"], ascending=False).iloc[0])
        for _, g in pdf.groupby("k")
    }
    assert got == want


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_uu_new_flags_invariants(spark, rows):
    """uu marks exactly one row per (key, day); new exactly one per key,
    and new => uu on that row."""
    df, pdf = _df(spark, rows)
    flagged = dedup.uu_new_flags(
        df.withColumn("dt", (F.col("o") % 2).cast("string")),
        "k",
        F.col("dt"),
        ["o", "d", "rid"],
    ).collect()
    per_day: dict = {}
    per_key: dict = {}
    for r in flagged:
        per_day[(r.k, r.dt)] = per_day.get((r.k, r.dt), 0) + r.uu
        per_key[r.k] = per_key.get(r.k, 0) + r.new
        if r.new:
            assert r.uu == 1
    assert all(v == 1 for v in per_day.values())
    assert all(v == 1 for v in per_key.values())
