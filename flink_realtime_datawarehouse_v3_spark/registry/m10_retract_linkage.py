"""Changelog (retract) aggregate + record-linkage entries.

Split out of the monolithic api.py in round 12 — REGISTRATION ORDER
is preserved by the import order in registry/__init__.py; the
order-drift and driver-window gates (tests/test_driver_order.py)
verify it.
"""

from __future__ import annotations

from ._core import cdc, oracle, register  # noqa: F401
from .m02_dws import dws  # noqa: F401

# --- Changelog (retract) aggregate (plans/dws.py) ----------------------------
# Flink's updating-stream COUNT semantics as delta algebra: +1 per event's
# status, -1 per update's old status. The oracle verifies through the
# INDEPENDENT derivation (latest state per order id, then count) — the two
# agree only if every retraction is applied exactly once.
register(
    "dws_order_status_counts_retract",
    lambda spark, sf: dws.order_status_counts_from_deltas(
        dws.order_status_count_deltas(
            cdc.topic_db_parsed(spark, sf, only=["order_info"])
        )
    ),
    oracle.sql(
        """SELECT CAST(province_id AS BIGINT) AS province_id, order_status,
       CAST(count(*) AS BIGINT) AS n_orders
FROM (SELECT id, province_id, order_status,
             row_number() OVER (PARTITION BY id
                                ORDER BY CAST(ts AS BIGINT) DESC,
                                         CASE type WHEN 'update' THEN 1
                                              ELSE 0 END DESC) AS rn
      FROM order_info_cdc)
WHERE rn = 1
GROUP BY province_id, order_status""",
        "order_info_cdc",
    ),
)


# --- Record linkage / entity resolution (operators/linkage.py) --------------
# Beyond-reference (SURVEY §9): blocked ER over the customer dim. The dirty
# feed is key-derived arithmetic mirrored row-for-row in the oracle, so the
# hash gate covers injection + blocking + verify + best-match end-to-end.
from ..operators import linkage as linkage_op  # noqa: E402

_ER_VARIANTS_SQL = f"""v0 AS (
  SELECT *, {linkage_op.NAME_DIGIT_BASE} + c_custkey % {linkage_op.NAME_DIGITS} AS p
  FROM customer WHERE c_custkey % {linkage_op.ER_STRIDE} = {linkage_op.ER_PHASE}
),
v AS (
  SELECT CAST(c_custkey + {linkage_op.ER_KEY_OFFSET} AS BIGINT) AS variant_key,
         CASE WHEN c_custkey % 2 = 0
              THEN concat(substring(c_name, 1, CAST(p - 1 AS INT)),
                          substring(c_name, CAST(p + 1 AS INT)))
              ELSE concat(substring(c_name, 1, CAST(p - 1 AS INT)), 'x',
                          substring(c_name, CAST(p + 1 AS INT)))
         END AS v_name,
         c_nationkey AS v_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS v_acctbal_cents
  FROM v0
),
vk AS (SELECT *, substring(v_name, 1, {linkage_op.PREFIX_LEN}) AS k_pre,
              substring(v_name, length(v_name) - {linkage_op.SUFFIX_LEN - 1},
                        {linkage_op.SUFFIX_LEN}) AS k_suf FROM v),
ck AS (SELECT c_custkey, c_name, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents,
             substring(c_name, 1, {linkage_op.PREFIX_LEN}) AS k_pre,
             substring(c_name, length(c_name) - {linkage_op.SUFFIX_LEN - 1},
                       {linkage_op.SUFFIX_LEN}) AS k_suf
      FROM customer)"""

register(
    "er_resolve_customers",
    linkage_op.resolve_customers,
    f"""WITH {_ER_VARIANTS_SQL},
cand AS (
  SELECT DISTINCT variant_key, v_name, v_nationkey, v_acctbal_cents,
                  c_custkey, c_name, c_nationkey, c_acctbal_cents
  FROM (
    SELECT vk.variant_key, vk.v_name, vk.v_nationkey, vk.v_acctbal_cents,
           ck.c_custkey, ck.c_name, ck.c_nationkey, ck.c_acctbal_cents
    FROM vk JOIN ck ON vk.k_pre = ck.k_pre
    UNION ALL
    SELECT vk.variant_key, vk.v_name, vk.v_nationkey, vk.v_acctbal_cents,
           ck.c_custkey, ck.c_name, ck.c_nationkey, ck.c_acctbal_cents
    FROM vk JOIN ck ON vk.k_suf = ck.k_suf)
),
ver AS (
  SELECT variant_key, c_custkey,
         CAST(levenshtein(v_name, c_name) AS BIGINT) AS name_dist
  FROM cand
  WHERE levenshtein(v_name, c_name) <= 2
    AND v_nationkey = c_nationkey AND v_acctbal_cents = c_acctbal_cents
)
SELECT variant_key, CAST(c_custkey AS BIGINT) AS canonical_key, name_dist,
       CAST(c_custkey = variant_key - {linkage_op.ER_KEY_OFFSET} AS BIGINT)
         AS is_correct
FROM (SELECT *, row_number() OVER (PARTITION BY variant_key
                                   ORDER BY name_dist, c_custkey) AS rn
      FROM ver)
WHERE rn = 1""",
)

register(
    "er_block_stats",
    linkage_op.er_block_stats,
    f"""WITH {_ER_VARIANTS_SQL},
vp AS (SELECT k_pre, CAST(count(*) AS BIGINT) AS n_dirty FROM vk GROUP BY k_pre),
cp AS (SELECT k_pre, CAST(count(*) AS BIGINT) AS n_clean FROM ck GROUP BY k_pre),
vs AS (SELECT k_suf, CAST(count(*) AS BIGINT) AS n_dirty FROM vk GROUP BY k_suf),
cs AS (SELECT k_suf, CAST(count(*) AS BIGINT) AS n_clean FROM ck GROUP BY k_suf)
SELECT 'prefix' AS pass_name, vp.k_pre AS block_key, n_dirty, n_clean,
       CAST(n_dirty * n_clean AS BIGINT) AS n_pairs
FROM vp JOIN cp ON vp.k_pre = cp.k_pre
UNION ALL
SELECT 'suffix' AS pass_name, vs.k_suf AS block_key, n_dirty, n_clean,
       CAST(n_dirty * n_clean AS BIGINT) AS n_pairs
FROM vs JOIN cs ON vs.k_suf = cs.k_suf""",
)


