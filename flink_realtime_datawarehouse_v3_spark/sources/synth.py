"""Deterministic SYNTHESIZED relations closing the TPC-H schema gaps.

The driver's parquet fixtures carry no ``partsupp`` table and no
``l_shipmode`` / ``l_commitdate`` / ``l_receiptdate`` lineitem columns,
which blocked TPC-H Q2/Q9/Q11/Q12/Q16 (SURVEY §9, r9 verdict item #4).
Both gaps are closed with PURE INTEGER/DATE ARITHMETIC over the existing
seeded tables — no stored data, no hashing (engine hash functions
differ) — so the Spark plan and the DuckDB oracle materialize EXACTLY
the same rows from the same parquet inputs and the driver's value-hash
gate stays meaningful.

partsupp follows the dbgen supplier-assignment shape (each part gets
``PS_PER_PART`` suppliers spread by a stride of |supplier| DIV 4;
TPC-H dbgen: ``ps_suppkey = (p + i*(S/4 + (p-1)/S)) % S + 1``, see
reference spec 4.2.3 — the (p-1)/S term is dropped here because with
the fixtures' small supplier counts it can make the stride ≡ 0 mod S
and collapse the four suppliers into one; the plain stride is distinct
for every S >= 4 since 3*(S DIV 4) < S). ps_availqty / ps_supplycost
are seeded linear-congruential arithmetic on the keys, money carried as
integer CENTS per the repo convention.

At 100 TB partsupp is |part| x 4 rows (fact-sized, ~8e9 at 2e9 parts):
every consumer below treats it as a FACT (equi-shuffle joins, never a
forced broadcast); it is derived, so it costs one |part|-scan plus a
4-way explode — cheaper than re-reading a stored copy and it inherits
part's partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tables

PS_PER_PART = 4

# The seven TPC-H ship modes, order fixed (index arithmetic below).
SHIP_MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]


def partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents) —
    derived from part x |supplier| with the stride formula above;
    mirrored row-for-row by :data:`PARTSUPP_CTE`."""
    p = tables.load(spark, sf_dir, "part").select("p_partkey")
    s_cnt = (
        tables.load(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).cast("bigint").alias("s_cnt"))
    )
    return (
        p.crossJoin(F.broadcast(s_cnt))  # 1-row artifact, not data
        .select(
            "p_partkey",
            "s_cnt",
            F.explode(F.sequence(F.lit(0), F.lit(PS_PER_PART - 1))).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr(
                "(p_partkey + i * (s_cnt DIV 4)) % s_cnt + 1"
            ).alias("ps_suppkey"),
            F.expr(
                "CAST((p_partkey * 13 + ((p_partkey + i * (s_cnt DIV 4)) "
                "% s_cnt + 1) * 7) % 9999 + 1 AS INT)"
            ).alias("ps_availqty"),
            F.expr(
                "(p_partkey * 97 + ((p_partkey + i * (s_cnt DIV 4)) "
                "% s_cnt + 1) * 31) % 99001 + 100"
            ).alias("ps_supplycost_cents"),
        )
    )


# DuckDB twin of partsupp() — same arithmetic verbatim (// is DuckDB's
# integer division, DIV is Spark's).
PARTSUPP_CTE = """ps_base AS (
    SELECT p_partkey,
           (p_partkey + i * (s_cnt // 4)) % s_cnt + 1 AS ps_suppkey
    FROM part
    CROSS JOIN (SELECT count(*) AS s_cnt FROM supplier)
    CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS i)
),
partsupp AS (
    SELECT p_partkey AS ps_partkey, ps_suppkey,
           CAST((p_partkey * 13 + ps_suppkey * 7) % 9999 + 1 AS INT)
             AS ps_availqty,
           (p_partkey * 97 + ps_suppkey * 31) % 99001 + 100
             AS ps_supplycost_cents
    FROM ps_base
)"""


def lineitem_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem + derived (l_shipmode, l_commitdate, l_receiptdate):
    mode indexed by key arithmetic over the seven TPC-H modes; commit
    within +/-30 days of ship (so the Q12 "commit before receipt, ship
    before commit" predicates select a real subset); receipt 1..30 days
    after ship. Mirrored by :data:`LINEITEM_SHIP_CTE`."""
    l = tables.load(spark, sf_dir, "lineitem")
    modes = F.array(*[F.lit(m) for m in SHIP_MODES])
    return l.select(
        "*",
        F.element_at(
            modes, ((F.col("l_orderkey") * 5 + F.col("l_linenumber")) % 7 + 1).cast("int")
        ).alias("l_shipmode"),
        F.expr(
            "date_add(CAST(l_shipdate AS DATE), "
            "CAST((l_orderkey * 3 + l_linenumber) % 61 - 30 AS INT))"
        ).alias("l_commitdate"),
        F.expr(
            "date_add(CAST(l_shipdate AS DATE), "
            "CAST((l_orderkey + l_linenumber * 7) % 30 + 1 AS INT))"
        ).alias("l_receiptdate"),
    )


_MODES_SQL = "[" + ", ".join(f"'{m}'" for m in SHIP_MODES) + "]"

LINEITEM_SHIP_CTE = f"""lineitem_ship AS (
    SELECT l.*,
           ({_MODES_SQL})[CAST((l_orderkey * 5 + l_linenumber) % 7 + 1 AS INT)]
             AS l_shipmode,
           CAST(l_shipdate AS DATE)
             + CAST((l_orderkey * 3 + l_linenumber) % 61 - 30 AS INT)
             AS l_commitdate,
           CAST(l_shipdate AS DATE)
             + CAST((l_orderkey + l_linenumber * 7) % 30 + 1 AS INT)
             AS l_receiptdate
    FROM lineitem l
)"""
