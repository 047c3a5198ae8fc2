"""DIM-layer registrations: config-driven routing (J10/P6/K5).

Split out of the monolithic api.py in round 12 — REGISTRATION ORDER
is preserved by the import order in registry/__init__.py; the
order-drift and driver-window gates (tests/test_driver_order.py)
verify it.
"""

from __future__ import annotations

from ._core import DataFrame, SparkSession, _cdc, oracle, register  # noqa: F401

# --- DIM layer: config-driven routing (J10/P6/K5) ----------------------------

from ..plans import dim as dim_plan  # noqa: E402

_DIM_LATEST = (
    "QUALIFY row_number() OVER (PARTITION BY id ORDER BY CAST(ts AS BIGINT) DESC, "
    "CASE WHEN type = 'update' THEN 1 ELSE 0 END DESC) = 1"
)

register(
    "dim_user_info",
    lambda spark, sf: dim_plan.route_one(
        _cdc(spark, sf, ["user_info"]), dim_plan.DIM_CONFIG[0]
    ),
    oracle.sql(
        f"SELECT id, name, create_time FROM user_info_cdc {_DIM_LATEST}",
        "user_info_cdc",
    ),
)

# Runtime schema evolution (TableProcessFunction.checkTable's ALTER path):
# the v2 config row widens dim_user_info with phone_num from its
# effective_ts on; earlier records keep NULL there. The oracle expresses the
# era split as a CASE over the record ts.
_EVOLVE_TS = dim_plan.USER_INFO_EVOLUTION[1].effective_ts

register(
    "dim_user_info_schema_evolve",
    lambda spark, sf: dim_plan.route_evolving(
        _cdc(spark, sf, ["user_info"]), dim_plan.USER_INFO_EVOLUTION
    ),
    oracle.sql(
        f"""SELECT id, name,
                   CASE WHEN CAST(ts AS BIGINT) >= {_EVOLVE_TS}
                        THEN phone_num END AS phone_num,
                   create_time
            FROM user_info_cdc {_DIM_LATEST}""",
        "user_info_cdc",
    ),
)

# SCD2 dimension history: every coupon_use version with its validity
# interval — the as-of-joinable history form next to the SCD1 dim above.
register(
    "dim_coupon_use_scd2",
    lambda spark, sf: dim_plan.scd2_history(
        _cdc(spark, sf, ["coupon_use"]), dim_plan.DIM_CONFIG[1]
    ),
    oracle.sql(
        """SELECT id, coupon_id, user_id, order_id, coupon_status, get_time,
                  using_time, used_time,
                  row_number() OVER w AS version,
                  CAST(ts AS BIGINT) AS start_ts,
                  lead(CAST(ts AS BIGINT)) OVER w AS end_ts,
                  CAST(lead(CAST(ts AS BIGINT)) OVER w IS NULL AS INT) AS is_current
           FROM coupon_use_cdc
           WINDOW w AS (PARTITION BY id ORDER BY CAST(ts AS BIGINT))""",
        "coupon_use_cdc",
    ),
)

# Event-time temporal join over the SCD2 history: each coupon PAY event
# joined to the dim version valid just before it (as-of pay_ts - 1) —
# always the used-but-unpaid version (status 1402, used_time NULL), which
# the oracle verifies value-for-value.
def _coupon_pay_asof(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    cdc_df = _cdc(spark, sf, ["coupon_use"])
    pay = cdc_df.filter(
        (F.col("type") == "update") & F.col("data").getItem("used_time").isNotNull()
    ).select(
        F.col("data").getItem("id").alias("id"),
        F.col("ts").cast("long").alias("pay_ts"),
        (F.col("ts").cast("long") - 1).alias("__asof_ts"),
    )
    hist = dim_plan.scd2_history(cdc_df, dim_plan.DIM_CONFIG[1])
    return dim_plan.temporal_join_scd2(
        pay, hist, "id", "__asof_ts",
        ["version", "coupon_status", "using_time", "used_time"],
    ).select("id", "pay_ts", "version", "coupon_status", "using_time", "used_time")


register(
    "temporal_join_coupon_asof",
    _coupon_pay_asof,
    oracle.sql(
        """SELECT p.id, p.pay_ts, h.version, h.coupon_status,
                  h.using_time, h.used_time
           FROM (SELECT id, CAST(ts AS BIGINT) AS pay_ts FROM coupon_use_cdc
                 WHERE type = 'update' AND used_time IS NOT NULL) p
           JOIN (SELECT id, coupon_status, using_time, used_time,
                        row_number() OVER w AS version,
                        CAST(ts AS BIGINT) AS start_ts,
                        lead(CAST(ts AS BIGINT)) OVER w AS end_ts
                 FROM coupon_use_cdc
                 WINDOW w AS (PARTITION BY id ORDER BY CAST(ts AS BIGINT))) h
             ON p.id = h.id
           WHERE h.start_ts <= p.pay_ts - 1
             AND (h.end_ts IS NULL OR p.pay_ts - 1 < h.end_ts)""",
        "coupon_use_cdc",
    ),
)

register(
    "dim_coupon_use",
    lambda spark, sf: dim_plan.route_one(
        _cdc(spark, sf, ["coupon_use"]), dim_plan.DIM_CONFIG[1]
    ),
    oracle.sql(
        "SELECT id, coupon_id, user_id, order_id, coupon_status, get_time, "
        f"using_time, used_time FROM coupon_use_cdc {_DIM_LATEST}",
        "coupon_use_cdc",
    ),
)


