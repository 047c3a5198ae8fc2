"""Deterministic 10x scale-up of a testdata SF dir (sf0.1 -> sf1).

The driver's synthetic tables stop at sf0.1; the sf1 TPC-H gate
(BASELINE.md round-12) needs sf1-scale inputs with the same schema and
referential integrity. This tool builds them by KEY-SHIFTED CLONING:
each scaled table is the union of ``factor`` copies with every
primary/foreign key shifted by ``i * K_table`` (K = max key + 1), so
FK joins resolve within each clone exactly as in the original —
value distributions, date ranges, and status-code domains are
preserved verbatim, which is what keeps every literal predicate in the
TPC-H family selective at sf1. Fixed-size dims (region, nation) are
copied unchanged.

Since r13 ``documents`` and ``embeddings`` scale the same way (doc_id
/ vec_id shift by their strides, 5000 / 2000 at sf0.1 — far below the
+1M/+2M offsets ``sources/corpus.py`` uses for its synthesized clone
families, so the derived corpus stays collision-free at factor 10).
Text/vector payloads are preserved verbatim, which is exactly the
clone-preserving property the sf1 dedup gate needs: every planted
near/exact duplicate relationship from the corpus derivation recurs in
each clone, and the cross-clone copies are themselves true duplicates
the dedup family must find — recall is measurable, and the
MAX_BAND_BUCKET clone-mass caps get 10x the stress they see at sf0.1.

Cross-clone ties are real and intended: the repo's ranked queries all
carry unique tie-break keys (the hash gate would have caught any that
did not), so ranking over tied measures stays deterministic in both
engines.

Deterministic by construction (pure arithmetic over the source
parquet; no RNG), so the committed TPCH_SF1_r{N}.json is reproducible
from this file alone.

Usage: python tools/synth_scale.py [--src /root/testdata/sf0.1]
         [--dst /tmp/spark_graft_sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

# table -> {column: key-family}; every key family shifts by the SAME
# stride in every table so FKs stay aligned within a clone.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "ev", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
# key family -> (table, column) the stride is measured on
STRIDE_ON = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ord": ("orders", "o_orderkey"),
    "ev": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
COPY_VERBATIM = ["region", "nation"]


def scale(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides = {
        fam: con.execute(
            f"SELECT max({col}) + 1 FROM read_parquet('{src}/{tab}.parquet')"
        ).fetchone()[0]
        for fam, (tab, col) in STRIDE_ON.items()
    }
    for t in COPY_VERBATIM:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"copied   {t}")
    for t, keys in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + i * {strides[keys[c]]} AS {c}" if c in keys else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{src}/{t}.parquet'), range({factor}) r(i) "
            f"ORDER BY i, {list(keys)[0]}) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"scaled   {t}: {n} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/spark_graft_sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    scale(args.src, args.dst, args.factor)


if __name__ == "__main__":
    main()
