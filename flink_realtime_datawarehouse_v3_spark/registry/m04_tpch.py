"""TPC-H closure registrations over the synthesized star schema.

Split out of the monolithic api.py in round 12 — REGISTRATION ORDER
is preserved by the import order in registry/__init__.py; the
order-drift and driver-window gates (tests/test_driver_order.py)
verify it.
"""

from __future__ import annotations

from ..sources import tables  # noqa: F401  (monolith late-bound this)
from ._core import _cdc, oracle, register  # noqa: F401
from .m03_joins import (  # noqa: F401
    analytics_op,
    joins_plan,
    olap_plan,
    profiling_op,
    synth_mod,
)

# --- TPC-H closure (r10): Q2/Q9/Q11/Q12/Q16 over the SYNTHESIZED
# partsupp / shipping columns (sources/synth.py — pure arithmetic,
# row-identical across engines; synth_mod imported at the Q21
# receipt-form registration above). Oracles keep the CORRELATED
# textbook forms, so the driver proves each decorrelation is exact.
register(
    "tpch_q2_min_cost_supplier",
    olap_plan.min_cost_supplier,
    f"""WITH {synth_mod.PARTSUPP_CTE}
SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
       s_name, n_name, p_partkey, p_brand, ps_supplycost_cents
FROM part p
JOIN partsupp ON p.p_partkey = ps_partkey
JOIN supplier s ON ps_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p_size = {olap_plan.Q2_SIZE} AND p_type = '{olap_plan.Q2_TYPE}'
  AND r_name = '{olap_plan.Q2_REGION}'
  AND ps_supplycost_cents = (
      SELECT min(ps2.ps_supplycost_cents)
      FROM partsupp ps2
      JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE ps2.ps_partkey = p.p_partkey
        AND r2.r_name = '{olap_plan.Q2_REGION}')
ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
LIMIT 100""",
)

register(
    "tpch_q9_product_type_profit",
    olap_plan.product_type_profit,
    f"""WITH {synth_mod.PARTSUPP_CTE}
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)
                - ps_supplycost_cents * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS profit_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%{olap_plan.Q9_NAME_SUB}%'
GROUP BY 1, 2""",
)

register(
    "tpch_q11_important_stock",
    olap_plan.important_stock,
    f"""WITH {synth_mod.PARTSUPP_CTE}
SELECT ps_partkey,
       CAST(sum(ps_supplycost_cents * CAST(ps_availqty AS BIGINT))
            AS BIGINT) AS value_cents
FROM partsupp
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{olap_plan.Q11_NATION}'
GROUP BY ps_partkey
HAVING sum(ps_supplycost_cents * CAST(ps_availqty AS BIGINT))
         * {olap_plan.Q11_FRACTION_DEN} >
       (SELECT sum(ps_supplycost_cents * CAST(ps_availqty AS BIGINT))
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = '{olap_plan.Q11_NATION}')""",
)

register(
    "tpch_q12_shipmode_priority",
    olap_plan.shipmode_priority,
    f"""WITH {synth_mod.LINEITEM_SHIP_CTE}
SELECT l_shipmode,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem_ship JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipmode IN ('{olap_plan.Q12_MODES[0]}', '{olap_plan.Q12_MODES[1]}')
  AND l_commitdate < l_receiptdate
  AND CAST(l_shipdate AS DATE) < l_commitdate
  AND l_receiptdate >= DATE '{olap_plan.Q12_YEAR_START}'
  AND l_receiptdate < DATE '{olap_plan.Q12_YEAR_END}'
GROUP BY l_shipmode""",
)

register(
    "tpch_q16_parts_supplier",
    olap_plan.parts_supplier_relationship,
    f"""WITH {synth_mod.PARTSUPP_CTE}
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> '{olap_plan.Q16_BRAND}'
  AND p_type NOT LIKE '{olap_plan.Q16_TYPE_PREFIX}%'
  AND p_size IN ({', '.join(str(s) for s in olap_plan.Q16_SIZES)})
  AND ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3""",
)

# Per-column data-quality profile (Deequ/GE-style acceptance report):
# null ppm, exact distinct count, modal value per events column — one
# stack() unpivot + one (column, value) hash agg; the modal pick runs
# over the bounded (column, value, count) table.
register(
    "events_column_profile",
    lambda spark, sf: profiling_op.column_profile(
        tables.load(spark, sf, "events")
    ),
    """WITH unp AS (
  SELECT 'event_id' AS col_name, CAST(event_id AS VARCHAR) AS val FROM events
  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
  UNION ALL SELECT 'event_type', event_type FROM events
  UNION ALL SELECT 'value',
    CAST(CAST(round(value * 1e6) AS BIGINT) AS VARCHAR) FROM events
  UNION ALL SELECT 'props', props FROM events
  UNION ALL SELECT 'ts', CAST(epoch_ms(ts) AS VARCHAR) FROM events),
counts AS (SELECT col_name, val, CAST(count(*) AS BIGINT) AS c
           FROM unp GROUP BY 1, 2),
ranked AS (SELECT *, row_number() OVER (PARTITION BY col_name
                ORDER BY c DESC, val ASC NULLS LAST) AS rn
           FROM counts)
SELECT col_name,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(CAST(sum(CASE WHEN val IS NULL THEN c ELSE 0 END) AS BIGINT)
            * 1000000 // sum(c) AS BIGINT) AS null_ppm,
       CAST(count(CASE WHEN val IS NOT NULL THEN 1 END) AS BIGINT)
         AS n_distinct,
       max(CASE WHEN rn = 1 AND val IS NOT NULL THEN val END) AS top_value,
       CAST(max(CASE WHEN rn = 1 AND val IS NOT NULL THEN c END) AS BIGINT)
         AS top_count
FROM ranked GROUP BY col_name""",
)

# Declarative acceptance suite (r10): the gate twin of the exploratory
# column_profile — every rule a conditional count in ONE scan, per-rule
# rows unpivoted from the 1-row aggregate.
_EXPECT_RULES_SQL = f"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS event_id_not_null,
  CAST(sum(CASE WHEN user_id IS NULL OR user_id < 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS user_id_non_negative,
  CAST(sum(CASE WHEN event_type NOT IN
           ({', '.join(repr(t) for t in analytics_op.EXPECTED_EVENT_TYPES)})
           THEN 1 ELSE 0 END) AS BIGINT) AS event_type_in_vocab,
  CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS value_non_negative,
  CAST(sum(CASE WHEN ts < TIMESTAMP '{analytics_op.EXPECT_TS_MIN}'
                  OR ts >= TIMESTAMP '{analytics_op.EXPECT_TS_MAX}'
           THEN 1 ELSE 0 END) AS BIGINT) AS ts_in_sanity_window
FROM events"""

register(
    "events_expectation_check",
    lambda spark, sf: analytics_op.expectation_check(
        tables.load(spark, sf, "events")
    ),
    f"""WITH a AS ({_EXPECT_RULES_SQL}),
u AS (
  SELECT 'event_id_not_null' AS rule, n_rows, event_id_not_null
    AS n_violations FROM a
  UNION ALL SELECT 'user_id_non_negative', n_rows, user_id_non_negative FROM a
  UNION ALL SELECT 'event_type_in_vocab', n_rows, event_type_in_vocab FROM a
  UNION ALL SELECT 'value_non_negative', n_rows, value_non_negative FROM a
  UNION ALL SELECT 'ts_in_sanity_window', n_rows, ts_in_sanity_window FROM a)
SELECT rule, n_rows, n_violations,
       CAST(n_violations * 1000000
            <= n_rows * {analytics_op.EXPECT_MAX_BAD_PPM} AS INT) AS passed
FROM u""",
)

from ..sources import bucketed as bucketed_mod  # noqa: E402

register(
    "join_bucketed_colocated",
    bucketed_mod.province_revenue_colocated,
    """SELECT c_nationkey AS province_key, count(*) AS line_ct,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       LEFT JOIN customer ON o_custkey = c_custkey
       GROUP BY c_nationkey""",
)

register(
    "join_activity_coupon_full_outer",
    lambda spark, sf: joins_plan.activity_coupon_full_outer(
        _cdc(spark, sf, ["order_detail_activity", "order_detail_coupon"])
    ),
    oracle.sql(
        """SELECT coalesce(oa.order_detail_id, oc.order_detail_id) AS order_detail_id,
                  oa.activity_id, oa.activity_rule_id,
                  oc.coupon_id, oc.coupon_use_id
           FROM order_detail_activity_cdc oa
           FULL OUTER JOIN order_detail_coupon_cdc oc
             ON oa.order_detail_id = oc.order_detail_id""",
        "order_detail_activity_cdc",
        "order_detail_coupon_cdc",
    ),
)

register(
    "join_activity_coupon_right_outer",
    lambda spark, sf: joins_plan.activity_coupon_right_outer(
        _cdc(spark, sf, ["order_detail_activity", "order_detail_coupon"])
    ),
    oracle.sql(
        """SELECT oc.order_detail_id AS order_detail_id,
                  oa.activity_id, oa.activity_rule_id,
                  oc.coupon_id, oc.coupon_use_id
           FROM order_detail_activity_cdc oa
           RIGHT OUTER JOIN order_detail_coupon_cdc oc
             ON oa.order_detail_id = oc.order_detail_id""",
        "order_detail_activity_cdc",
        "order_detail_coupon_cdc",
    ),
)


