"""DWD registrations: single-table CDC, trade-domain joins, traffic logs.

Split out of the monolithic api.py in round 12 — REGISTRATION ORDER
is preserved by the import order in registry/__init__.py; the
order-drift and driver-window gates (tests/test_driver_order.py)
verify it.
"""

from __future__ import annotations

from ._core import (  # noqa: F401
    DataFrame,
    SparkSession,
    _cdc,
    _memo_df,
    dic,
    dwd_simple,
    dwd_trade,
    oracle,
    register,
)

# --- DWD: single-table CDC pipelines -----------------------------------------

register(
    "dwd_user_register",
    lambda spark, sf: dwd_simple.dwd_user_register(_cdc(spark, sf, ["user_info"])),
    oracle.sql(
        """SELECT id AS user_id,
                  strftime(CAST(create_time AS TIMESTAMP), '%Y-%m-%d') AS date_id,
                  create_time, ts
           FROM user_info_cdc WHERE type = 'insert'""",
        "user_info_cdc",
    ),
)

register(
    "dwd_tool_coupon_get",
    lambda spark, sf: dwd_simple.dwd_tool_coupon_get(_cdc(spark, sf, ["coupon_use"])),
    oracle.sql(
        """SELECT id, coupon_id, user_id,
                  strftime(CAST(get_time AS TIMESTAMP), '%Y-%m-%d') AS date_id,
                  get_time, ts
           FROM coupon_use_cdc WHERE type = 'insert'""",
        "coupon_use_cdc",
    ),
)

register(
    "dwd_tool_coupon_order",
    lambda spark, sf: dwd_simple.dwd_tool_coupon_order(_cdc(spark, sf, ["coupon_use"])),
    oracle.sql(
        """SELECT id, coupon_id, user_id, order_id,
                  strftime(CAST(using_time AS TIMESTAMP), '%Y-%m-%d') AS date_id,
                  using_time, ts
           FROM coupon_use_cdc
           WHERE type = 'update' AND coupon_status = '1402'
             AND old_coupon_status = '1401'""",
        "coupon_use_cdc",
    ),
)

register(
    "dwd_tool_coupon_pay",
    lambda spark, sf: dwd_simple.dwd_tool_coupon_pay(_cdc(spark, sf, ["coupon_use"])),
    oracle.sql(
        """SELECT id, coupon_id, user_id, order_id,
                  strftime(CAST(used_time AS TIMESTAMP), '%Y-%m-%d') AS date_id,
                  used_time, ts
           FROM coupon_use_cdc
           WHERE type = 'update' AND used_time IS NOT NULL""",
        "coupon_use_cdc",
    ),
)

register(
    "dwd_interaction_favor_add",
    lambda spark, sf: dwd_simple.dwd_interaction_favor_add(_cdc(spark, sf, ["favor_info"])),
    oracle.sql(
        """SELECT id, user_id, sku_id,
                  strftime(CAST(create_time AS TIMESTAMP), '%Y-%m-%d') AS date_id,
                  create_time, ts
           FROM favor_info_cdc
           WHERE type = 'insert' OR (type = 'update' AND is_cancel = '0')""",
        "favor_info_cdc",
    ),
)

register(
    "dwd_interaction_comment",
    lambda spark, sf: dwd_simple.dwd_interaction_comment(
        _cdc(spark, sf, ["comment_info"]), dic.base_dic(spark)
    ),
    oracle.sql(
        """SELECT ci.id, ci.user_id, ci.sku_id, ci.order_id,
                  strftime(CAST(ci.create_time AS TIMESTAMP), '%Y-%m-%d') AS date_id,
                  ci.create_time,
                  ci.appraise AS appraise_code,
                  dic.dic_name AS appraise_name,
                  ci.ts
           FROM comment_info_cdc ci
           JOIN base_dic dic ON ci.appraise = dic.dic_code
           WHERE ci.type = 'insert'""",
        "comment_info_cdc",
        "base_dic",
    ),
)


# --- DWD: trade-domain join pipelines ----------------------------------------

_PRE_TABLES = [
    "order_detail",
    "order_info",
    "order_detail_activity",
    "order_detail_coupon",
]


def _pre(spark: SparkSession, sf: str) -> DataFrame:
    return _memo_df(
        spark,
        "dwd_order_pre",
        sf,
        lambda: dwd_trade.order_pre_process(
            _cdc(spark, sf, _PRE_TABLES), dic.base_dic(spark)
        ),
    )


register(
    "dwd_trade_order_pre_process",
    _pre,
    oracle.sql("SELECT * FROM dwd_order_pre", *oracle.PRE_CTES),
)

register(
    "dwd_trade_order_detail",
    lambda spark, sf: dwd_trade.order_detail(_pre(spark, sf)),
    oracle.sql("SELECT * FROM dwd_order_detail", *oracle.DETAIL_CTES),
)

register(
    "dwd_trade_cancel_detail",
    lambda spark, sf: dwd_trade.cancel_detail(_pre(spark, sf)),
    oracle.sql(
        """SELECT id, order_id, user_id, sku_id, sku_name, province_id,
                  activity_id, activity_rule_id, coupon_id,
                  operate_time AS cancel_time, source_id, source_type_id,
                  source_type_name, sku_num, order_price,
                  split_activity_amount, split_coupon_amount,
                  split_total_amount
           FROM dwd_order_pre
           WHERE type = 'update' AND old_order_status IS NOT NULL
             AND order_status = '1003'""",
        *oracle.PRE_CTES,
    ),
)

def _cart_add(spark: SparkSession, sf: str) -> DataFrame:
    # Memoized like _pre: the DWS cart-add UU window consumes the
    # dwd_trade_cart_add topic (RT/app/dws/DwsTradeCartAddUuWindow.java),
    # never re-running the CDC join.
    return _memo_df(
        spark,
        "dwd_cart_add",
        sf,
        lambda: dwd_trade.cart_add(
            _cdc(spark, sf, ["cart_info"]), dic.base_dic(spark)
        ),
    )


register(
    "dwd_trade_cart_add",
    lambda spark, sf: _cart_add(spark, sf),
    oracle.sql(
        """SELECT ci.id, ci.user_id, ci.sku_id, ci.cart_price,
                  CASE WHEN ci.type = 'insert' THEN ci.sku_num
                       ELSE CAST(CAST(ci.sku_num AS INT) - CAST(ci.old_sku_num AS INT) AS VARCHAR)
                  END AS sku_num,
                  ci.sku_name, ci.is_checked, ci.create_time, ci.operate_time,
                  ci.is_ordered, ci.order_time,
                  ci.source_type AS source_type_id,
                  dic.dic_name AS source_type_name,
                  ci.source_id
           FROM cart_info_cdc ci
           JOIN base_dic dic ON ci.source_type = dic.dic_code
           WHERE ci.type = 'insert'
              OR (ci.type = 'update' AND ci.old_sku_num IS NOT NULL
                  AND CAST(ci.sku_num AS INT) > CAST(ci.old_sku_num AS INT))""",
        "cart_info_cdc",
        "base_dic",
    ),
)

def _pay_detail(spark: SparkSession, sf: str) -> DataFrame:
    # Memoized like _pre: the DWS payment window consumes the
    # dwd_trade_pay_detail_suc topic (RT/app/dws/DwsTradePaymentSucWindow
    # .java:60-71), never re-running the 3-way payment join.
    return _memo_df(
        spark,
        "dwd_pay_detail_suc",
        sf,
        lambda: dwd_trade.pay_detail_suc(
            _cdc(spark, sf, ["payment_info"]),
            dwd_trade.order_detail(_pre(spark, sf)),
            dic.base_dic(spark),
        ),
    )


register(
    "dwd_trade_pay_detail_suc",
    lambda spark, sf: _pay_detail(spark, sf),
    oracle.sql(
        """SELECT od.id AS order_detail_id, od.order_id, od.user_id,
                  od.sku_id, od.sku_name, od.province_id, od.activity_id,
                  od.activity_rule_id, od.coupon_id,
                  pi.payment_type AS payment_type_code,
                  dic.dic_name AS payment_type_name,
                  pi.callback_time, od.source_id, od.source_type_id,
                  od.source_type_name, od.sku_num, od.order_price,
                  od.split_activity_amount, od.split_coupon_amount,
                  od.split_total_amount AS split_payment_amount
           FROM payment_info_cdc pi
           JOIN dwd_order_detail od ON pi.order_id = od.order_id
           JOIN base_dic dic ON pi.payment_type = dic.dic_code
           WHERE pi.type = 'update' AND pi.payment_status = '1602'""",
        "payment_info_cdc",
        *oracle.DETAIL_CTES,
    ),
)

def _refund(spark: SparkSession, sf: str) -> DataFrame:
    # Memoized like _pre: the reference's DWS refund window consumes the
    # dwd_trade_order_refund KAFKA TOPIC (RT/app/dws/DwsTradeTrademark
    # CategoryUserRefundWindow.java:60-75) — it never re-runs the CDC
    # join; re-deriving it per DWS query would be both slower and
    # architecturally unfaithful.
    return _memo_df(
        spark,
        "dwd_order_refund",
        sf,
        lambda: dwd_trade.order_refund(
            _cdc(spark, sf, ["order_refund_info", "order_info"]),
            dic.base_dic(spark),
        ),
    )


register(
    "dwd_trade_order_refund",
    lambda spark, sf: _refund(spark, sf),
    oracle.sql(
        """SELECT ri.id, ri.user_id, ri.order_id, ri.sku_id, oi.province_id,
                  strftime(CAST(ri.create_time AS TIMESTAMP), '%Y-%m-%d') AS date_id,
                  ri.create_time,
                  ri.refund_type AS refund_type_code,
                  tdic.dic_name AS refund_type_name,
                  ri.refund_reason_type AS refund_reason_type_code,
                  rdic.dic_name AS refund_reason_type_name,
                  ri.refund_reason_txt, ri.refund_num, ri.refund_amount, ri.ts
           FROM order_refund_info_cdc ri
           JOIN (SELECT * FROM order_info_cdc
                 WHERE type = 'update' AND order_status = '1005'
                   AND old_order_status IS NOT NULL) oi
             ON ri.order_id = oi.id
           JOIN base_dic tdic ON ri.refund_type = tdic.dic_code
           JOIN base_dic rdic ON ri.refund_reason_type = rdic.dic_code
           WHERE ri.type = 'insert'""",
        "order_refund_info_cdc",
        "order_info_cdc",
        "base_dic",
    ),
)

register(
    "dwd_trade_refund_pay_suc",
    lambda spark, sf: dwd_trade.refund_pay_suc(
        _cdc(spark, sf, ["refund_payment", "order_info", "order_refund_info"]),
        dic.base_dic(spark),
    ),
    oracle.sql(
        """SELECT rp.id, oi.user_id, rp.order_id, rp.sku_id, oi.province_id,
                  rp.payment_type AS payment_type_code,
                  dic.dic_name AS payment_type_name,
                  strftime(CAST(rp.callback_time AS TIMESTAMP), '%Y-%m-%d') AS date_id,
                  rp.callback_time, ri.refund_num, rp.total_amount, rp.ts
           FROM refund_payment_cdc rp
           JOIN (SELECT * FROM order_info_cdc
                 WHERE type = 'update' AND order_status = '1006'
                   AND old_order_status IS NOT NULL) oi
             ON rp.order_id = oi.id
           JOIN order_refund_info_cdc ri
             ON rp.order_id = ri.order_id AND rp.sku_id = ri.sku_id
           JOIN base_dic dic ON rp.payment_type = dic.dic_code""",
        "refund_payment_cdc",
        "order_info_cdc",
        "order_refund_info_cdc",
        "base_dic",
    ),
)


# --- DWD: traffic (app-log) pipelines ----------------------------------------

from ..plans import dwd_traffic  # noqa: E402
from ..sources import logs  # noqa: E402


def _log(spark: SparkSession, sf: str) -> DataFrame:
    return _memo_df(
        spark,
        "dwd_log_repaired",
        sf,
        lambda: dwd_traffic.repair_is_new(
            logs.parse_topic_log(logs.topic_log_json_cached(spark, sf))
        ),
    )


register(
    "dwd_traffic_page_log",
    lambda spark, sf: dwd_traffic.page_log(_log(spark, sf)),
    oracle.sql(f"SELECT {oracle.PAGE_COLS} FROM dwd_page_log", *oracle.LOG_CTES),
)

register(
    "dwd_traffic_start_log",
    lambda spark, sf: dwd_traffic.start_log(_log(spark, sf)),
    oracle.sql(
        """SELECT f.ar, f.ch, r.is_new, f.md, f.mid, f.os, f.uid, f.vc,
                  f.event_id, f.ts_ms AS ts,
                  CASE WHEN f.k % 2 = 0 THEN 'icon' ELSE 'notice' END AS entry,
                  CAST(f.k % 2000 AS INT) AS loading_time,
                  CAST(f.k % 20 AS INT) AS open_ad_id,
                  CAST(f.k % 1000 AS INT) AS open_ad_ms,
                  CAST(f.k % 100 AS INT) AS open_ad_skip_ms
           FROM log_full f JOIN log_repair r USING (event_id)
           WHERE f.event_type = 'signup'""",
        "log_full",
        "log_item",
        "log_repair",
    ),
)

register(
    "dwd_traffic_error_log",
    lambda spark, sf: dwd_traffic.error_log(_log(spark, sf)),
    oracle.sql(
        """SELECT f.ar, f.ch, r.is_new, f.md, f.mid, f.os, f.uid, f.vc,
                  f.event_id, f.ts_ms AS ts,
                  CAST(2000 + f.k % 10 AS INT) AS error_code,
                  'err_' || CAST(f.k % 10 AS VARCHAR) AS msg
           FROM log_full f JOIN log_repair r USING (event_id)
           WHERE f.event_type = 'error'""",
        "log_full",
        "log_item",
        "log_repair",
    ),
)

register(
    "dwd_traffic_display_log",
    lambda spark, sf: dwd_traffic.display_log(_log(spark, sf)),
    oracle.sql(
        """SELECT p.ar, p.ch, r.is_new, p.md, p.mid, p.os, p.uid, p.vc,
                  p.event_id, p.ts_ms AS ts, p.page_id,
                  CASE (p.k + g.i) % 3 WHEN 0 THEN 'promotion'
                       WHEN 1 THEN 'query' ELSE 'recommend' END AS display_type,
                  CAST((p.k * 31 + g.i) % 2000 AS VARCHAR) AS item,
                  'sku_id' AS item_type,
                  CAST(g.i AS INT) AS pos_id
           FROM log_pages p
           JOIN log_repair r USING (event_id)
           CROSS JOIN LATERAL (SELECT UNNEST(generate_series(1, 1 + p.k % 3)) AS i) g
           WHERE p.event_type = 'click'""",
        "log_full",
        "log_item",
        "log_pages",
        "log_repair",
    ),
)

register(
    "dwd_traffic_action_log",
    lambda spark, sf: dwd_traffic.action_log(_log(spark, sf)),
    oracle.sql(
        """SELECT p.ar, p.ch, r.is_new, p.md, p.mid, p.os, p.uid, p.vc,
                  p.event_id, p.page_id,
                  CASE (p.k + g.i) % 2 WHEN 0 THEN 'cart_add'
                       ELSE 'favor_add' END AS action_id,
                  CAST((p.k * 17 + g.i) % 2000 AS VARCHAR) AS item,
                  'sku_id' AS item_type,
                  p.ts_ms + g.i * 1000 AS action_ts
           FROM log_pages p
           JOIN log_repair r USING (event_id)
           CROSS JOIN LATERAL (SELECT UNNEST(generate_series(1, 1 + p.k % 2)) AS i) g
           WHERE p.event_type = 'purchase'""",
        "log_full",
        "log_item",
        "log_pages",
        "log_repair",
    ),
)

# P2/W7 dirty side output (reference OutputTag, RT/app/dwd/BaseLogApp.java:54-69):
# the raw rows the clean parse rejects. The synthesized dirty rows are
# deterministic ('#dirty-log#' || event_id for event_id % 101 == 0), so the
# oracle is a direct projection over events.
register(
    "dwd_traffic_dirty_log",
    lambda spark, sf: logs.dirty_topic_log(logs.topic_log_json_cached(spark, sf)),
    """SELECT '#dirty-log#' || CAST(event_id AS VARCHAR) AS value
       FROM events WHERE event_id % 101 = 0""",
)

register(
    "dwd_traffic_unique_visitor_detail",
    lambda spark, sf: dwd_traffic.unique_visitor_detail(
        dwd_traffic.page_log(_log(spark, sf))
    ),
    oracle.sql(
        f"""SELECT {oracle.PAGE_COLS}
            FROM (SELECT *, row_number() OVER
                      (PARTITION BY mid, dt ORDER BY ts, event_id) AS rn
                  FROM dwd_page_log WHERE last_page_id IS NULL)
            WHERE rn = 1""",
        *oracle.LOG_CTES,
    ),
)

register(
    "dwd_traffic_user_jump_detail",
    lambda spark, sf: dwd_traffic.user_jump_detail(
        dwd_traffic.page_log(_log(spark, sf))
    ),
    oracle.sql(
        f"""SELECT {oracle.PAGE_COLS}
            FROM (SELECT *, lead(ts) OVER w AS next_ts,
                         lead(last_page_id) OVER w AS next_last_page
                  FROM dwd_page_log
                  WINDOW w AS (PARTITION BY mid ORDER BY ts, event_id))
            WHERE last_page_id IS NULL
              AND (next_ts IS NULL OR next_ts - ts > 10000
                   OR next_last_page IS NULL)""",
        *oracle.LOG_CTES,
    ),
)


