"""tools/synth_scale.py: the deterministic SF scale-up behind the sf1
TPC-H gate (TPCH_SF1_r12.json). Pins the properties the gate relies on:
exact factor-x row counts, schema preservation, FK integrity WITHIN
every clone (key-shifted copies must join exactly like the original),
and determinism (two builds are byte-equal per table content).

Pure DuckDB arithmetic — no Spark session.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import synth_scale  # noqa: E402

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sfx"))
    synth_scale.scale(SRC, dst, factor=3)
    return dst


def _one(con, sql):
    return con.execute(sql).fetchone()[0]


def test_row_counts_and_schema(scaled):
    con = duckdb.connect()
    for t in synth_scale.KEYED:
        n_src = _one(con, f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')")
        n_dst = _one(con, f"SELECT count(*) FROM read_parquet('{scaled}/{t}.parquet')")
        assert n_dst == 3 * n_src, t
        cols_src = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()
        cols_dst = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{scaled}/{t}.parquet')"
        ).fetchall()
        assert [c[0] for c in cols_src] == [c[0] for c in cols_dst], t
    for t in synth_scale.COPY_VERBATIM:
        assert _one(
            con, f"SELECT count(*) FROM read_parquet('{scaled}/{t}.parquet')"
        ) == _one(con, f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"), t


def test_fk_integrity_within_clones(scaled):
    """Every FK in the scaled tables resolves (no orphans), and each
    order's lineitems stay with their clone (the key-shift must move
    parent and child by the same stride)."""
    con = duckdb.connect()
    for child, ck, parent, pk in [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]:
        orphans = _one(
            con,
            f"SELECT count(*) FROM read_parquet('{scaled}/{child}.parquet') c "
            f"LEFT JOIN read_parquet('{scaled}/{parent}.parquet') p "
            f"ON c.{ck} = p.{pk} WHERE p.{pk} IS NULL",
        )
        assert orphans == 0, f"{child}.{ck} -> {parent}.{pk}"
    # per-order lineitem multiplicity is preserved exactly 1:1 per clone
    src_max = _one(
        con,
        f"SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM "
        f"read_parquet('{SRC}/lineitem.parquet') GROUP BY l_orderkey)",
    )
    dst_max = _one(
        con,
        f"SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM "
        f"read_parquet('{scaled}/lineitem.parquet') GROUP BY l_orderkey)",
    )
    assert src_max == dst_max


def test_deterministic(scaled, tmp_path):
    dst2 = str(tmp_path / "again")
    synth_scale.scale(SRC, dst2, factor=3)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        h1 = con.execute(
            "SELECT md5(string_agg(rowtext, '|' ORDER BY rowtext)) FROM ("
            f"SELECT CAST(t AS VARCHAR) AS rowtext FROM "
            f"read_parquet('{scaled}/{t}.parquet') t)"
        ).fetchone()[0]
        h2 = con.execute(
            "SELECT md5(string_agg(rowtext, '|' ORDER BY rowtext)) FROM ("
            f"SELECT CAST(t AS VARCHAR) AS rowtext FROM "
            f"read_parquet('{dst2}/{t}.parquet') t)"
        ).fetchone()[0]
        assert h1 == h2, t
