"""Trade-domain DWD pipelines (the join-heavy layer).

Reference jobs re-expressed Spark-first:

- ``order_pre_process``: 5-table wide row (RT/app/dwd/DwdTradeOrderPreProcess.java:141-198)
  — stream-stream inner + 2 left joins + temporal dic join. Batch parity =
  plain joins; the dic temporal join collapses to a broadcast hash join
  (SURVEY.md J3). In streaming these run under watermark-bounded
  stream-stream joins (see streaming/).
- ``order_detail`` / ``cancel_detail``: changelog filters over the wide row
  (RT/app/dwd/DwdTradeOrderDetail.java:80-146, DwdTradeCancelDetail.java:95-140).
- ``cart_add``: old-vs-new delta projection (RT/app/dwd/DwdTradeCartAdd.java:38-90).
  NOTE the reference WHERE clause has a missing-parentheses bug (the
  ``update`` branch is not guarded by ``table='cart_info'``); we implement
  the intended semantics (guarded) — divergence documented here.
- ``pay_detail_suc``: payment x order-detail x dic (RT/app/dwd/DwdTradePayDetailSuc.java:88-120).
- ``order_refund``: refund x order x dic twice (RT/app/dwd/DwdTradeOrderRefund.java:62-133).
- ``refund_pay_suc``: 4-way composite-key join (RT/app/dwd/DwdTradeRefundPaySuc.java:65-143).

Scale notes: the fact-fact joins (detail x order, payment x detail) shuffle
on the order key — unavoidable and well-partitioned (AQE handles skewed hot
orders); every dic join is broadcast; the wide row is projected before the
join so only needed columns shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _d(key: str) -> Column:
    return F.col("data").getItem(key)


def _old(key: str) -> Column:
    return F.col("old").getItem(key)


def _date_id(c: Column) -> Column:
    return F.date_format(c, "yyyy-MM-dd")


_ORDER_INFO_KEYS = [
    "consignee",
    "consignee_tel",
    "total_amount",
    "order_status",
    "user_id",
    "payment_way",
    "delivery_address",
    "order_comment",
    "out_trade_no",
    "trade_body",
    "create_time",
    "operate_time",
    "expire_time",
    "process_status",
    "tracking_no",
    "parent_order_id",
    "province_id",
    "activity_reduce_amount",
    "coupon_reduce_amount",
    "original_total_amount",
    "feight_fee",
    "feight_fee_reduce",
    "refundable_time",
]

_ORDER_DETAIL_KEYS = [
    "id",
    "order_id",
    "sku_id",
    "sku_name",
    "order_price",
    "sku_num",
    "create_time",
    "source_type",
    "source_id",
    "split_total_amount",
    "split_activity_amount",
    "split_coupon_amount",
]


def order_pre_process(
    topic_db: DataFrame,
    base_dic: DataFrame,
    event_time: bool = False,
    watermark: str = "10 seconds",
) -> DataFrame:
    """5-table wide order row (insert/update changelog).

    Output matches the reference upsert-kafka contract
    (RT/app/dwd/DwdTradeOrderPreProcess.java:200-247) minus the
    nondeterministic ``row_op_ts``, with the raw ``old`` map flattened to
    ``old_order_status`` (hashable contract).

    The two LEFT joins carry a +/- 5 s event-time bound IN BOTH MODES —
    the Spark mapping of the reference's 5 s idle-state TTL
    (`table.exec.state.ttl`, RT/app/dwd/DwdTradeOrderPreProcess.java:39):
    Flink evicts join state 5 s after last access, so an
    order_detail_activity row arriving days after its order_detail row
    never matches there either. order_detail_activity/_coupon rows are
    written in the same binlog transaction as their order_detail row
    (identical CDC ts), so the bound drops no real same-transaction
    matches; what it correctly rejects is cross-matching duplicate
    order_detail ids RE-INSERTED months apart. The od x oi INNER join is
    left time-unbounded: matching order_info updates arrive days later,
    which the reference's 5 s TTL would silently LOSE on replay at
    production cadence (state evicted between binlog events); unbounded
    inner-join state keeps the declared changelog semantics instead of the
    accidental-loss behavior. The base_dic join is stream-static broadcast
    (J3) in both modes.

    ``event_time=True`` is the streaming form (J1/J2, SURVEY.md §2.4):
    each branch additionally gets a watermark, so the bounded left joins
    can evict state and the unmatched-null rows flush as the watermark
    passes.
    """
    def _et(alias: str) -> list:
        return [F.to_timestamp(F.from_unixtime(F.col("ts").cast("long"))).alias(alias)]

    def _wm(df: DataFrame, alias: str) -> DataFrame:
        return df.withWatermark(alias, watermark) if event_time else df

    od = _wm(
        topic_db.filter(
            (F.col("database") == "gmall_0105")
            & (F.col("table") == "order_detail")
            & (F.col("type") == "insert")
        ).select(*[_d(k).alias(k) for k in _ORDER_DETAIL_KEYS], *_et("od_et")),
        "od_et",
    )
    oi = _wm(
        topic_db.filter(
            (F.col("database") == "gmall_0105")
            & (F.col("table") == "order_info")
            & F.col("type").isin("insert", "update")
        ).select(
            _d("id").alias("oi_id"),
            *[_d(k).alias(f"oi_{k}") for k in _ORDER_INFO_KEYS],
            F.col("type").alias("oi_type"),
            _old("order_status").alias("old_order_status"),
            *_et("oi_et"),
        ),
        "oi_et",
    )
    oa = _wm(
        topic_db.filter(
            (F.col("database") == "gmall_0105")
            & (F.col("table") == "order_detail_activity")
            & (F.col("type") == "insert")
        ).select(
            _d("id").alias("order_detail_activity_id"),
            _d("order_detail_id").alias("oa_order_detail_id"),
            _d("activity_id").alias("activity_id"),
            _d("activity_rule_id").alias("activity_rule_id"),
            *_et("oa_et"),
        ),
        "oa_et",
    )
    oc = _wm(
        topic_db.filter(
            (F.col("database") == "gmall_0105")
            & (F.col("table") == "order_detail_coupon")
            & (F.col("type") == "insert")
        ).select(
            _d("id").alias("order_detail_coupon_id"),
            _d("order_detail_id").alias("oc_order_detail_id"),
            _d("coupon_id").alias("coupon_id"),
            _d("coupon_use_id").alias("coupon_use_id"),
            *_et("oc_et"),
        ),
        "oc_et",
    )

    def _bound(cond, left_et: str, right_et: str):
        return (
            cond
            & (F.col(right_et) >= F.col(left_et) - F.expr("INTERVAL 5 SECONDS"))
            & (F.col(right_et) <= F.col(left_et) + F.expr("INTERVAL 5 SECONDS"))
        )

    # Bounded LEFT joins FIRST, unbounded inner join LAST: the inner join
    # emits a match only when the (possibly much later) order_info row
    # arrives, so any time-bounded operator placed downstream of it would
    # see rows whose od_et is already behind the watermark and drop them
    # as late.  Left-join keys (od.id) are independent of oi, so batch
    # results are order-insensitive.
    joined = (
        od.join(oa, _bound(od.id == oa.oa_order_detail_id, "od_et", "oa_et"), "left")
        .join(oc, _bound(od.id == oc.oc_order_detail_id, "od_et", "oc_et"), "left")
        .join(oi, F.col("order_id") == oi.oi_id, "inner")
        .join(F.broadcast(base_dic), F.col("source_type") == base_dic.dic_code, "inner")
    )
    return joined.select(
        "id",
        "order_id",
        "sku_id",
        "sku_name",
        "order_price",
        "sku_num",
        "create_time",
        F.col("source_type").alias("source_type_id"),
        F.col("dic_name").alias("source_type_name"),
        "source_id",
        "split_total_amount",
        "split_activity_amount",
        "split_coupon_amount",
        F.col("oi_consignee").alias("consignee"),
        F.col("oi_consignee_tel").alias("consignee_tel"),
        F.col("oi_total_amount").alias("total_amount"),
        F.col("oi_order_status").alias("order_status"),
        F.col("oi_user_id").alias("user_id"),
        F.col("oi_payment_way").alias("payment_way"),
        F.col("oi_delivery_address").alias("delivery_address"),
        F.col("oi_order_comment").alias("order_comment"),
        F.col("oi_out_trade_no").alias("out_trade_no"),
        F.col("oi_trade_body").alias("trade_body"),
        F.col("oi_operate_time").alias("operate_time"),
        F.col("oi_expire_time").alias("expire_time"),
        F.col("oi_process_status").alias("process_status"),
        F.col("oi_tracking_no").alias("tracking_no"),
        F.col("oi_parent_order_id").alias("parent_order_id"),
        F.col("oi_province_id").alias("province_id"),
        F.col("oi_activity_reduce_amount").alias("activity_reduce_amount"),
        F.col("oi_coupon_reduce_amount").alias("coupon_reduce_amount"),
        F.col("oi_original_total_amount").alias("original_total_amount"),
        F.col("oi_feight_fee").alias("feight_fee"),
        F.col("oi_feight_fee_reduce").alias("feight_fee_reduce"),
        F.col("oi_refundable_time").alias("refundable_time"),
        "order_detail_activity_id",
        "activity_id",
        "activity_rule_id",
        "order_detail_coupon_id",
        "coupon_id",
        "coupon_use_id",
        F.col("oi_type").alias("type"),
        "old_order_status",
    )


_ORDER_DETAIL_OUT = [
    "id",
    "order_id",
    "user_id",
    "sku_id",
    "sku_name",
    "sku_num",
    "order_price",
    "province_id",
    "activity_id",
    "activity_rule_id",
    "coupon_id",
    "create_time",
    "source_id",
    "source_type_id",
    "source_type_name",
    "split_activity_amount",
    "split_coupon_amount",
    "split_total_amount",
]


def order_detail(pre: DataFrame) -> DataFrame:
    """Order-placement fact: pre-process rows with type='insert'
    (reference: RT/app/dwd/DwdTradeOrderDetail.java:80-146)."""
    return pre.filter(F.col("type") == "insert").select(*_ORDER_DETAIL_OUT)


def cancel_detail(pre: DataFrame) -> DataFrame:
    """Order-cancel fact (reference: RT/app/dwd/DwdTradeCancelDetail.java:95-140):
    ``type='update' AND old['order_status'] IS NOT NULL AND order_status='1003'``;
    operate_time becomes cancel_time."""
    return pre.filter(
        (F.col("type") == "update")
        & F.col("old_order_status").isNotNull()
        & (F.col("order_status") == "1003")
    ).select(
        "id",
        "order_id",
        "user_id",
        "sku_id",
        "sku_name",
        "province_id",
        "activity_id",
        "activity_rule_id",
        "coupon_id",
        F.col("operate_time").alias("cancel_time"),
        "source_id",
        "source_type_id",
        "source_type_name",
        "sku_num",
        "order_price",
        "split_activity_amount",
        "split_coupon_amount",
        "split_total_amount",
    )


def cart_add(topic_db: DataFrame, base_dic: DataFrame) -> DataFrame:
    """Cart-add fact with old-vs-new delta sku_num
    (reference: RT/app/dwd/DwdTradeCartAdd.java:38-90)."""
    sku_num_delta = F.when(F.col("type") == "insert", _d("sku_num")).otherwise(
        (_d("sku_num").cast("int") - _old("sku_num").cast("int")).cast("string")
    )
    ci = topic_db.filter(
        (F.col("database") == "gmall_0105")
        & (F.col("table") == "cart_info")
        & (
            (F.col("type") == "insert")
            | (
                (F.col("type") == "update")
                & _old("sku_num").isNotNull()
                & (_d("sku_num").cast("int") > _old("sku_num").cast("int"))
            )
        )
    ).select(
        _d("id").alias("id"),
        _d("user_id").alias("user_id"),
        _d("sku_id").alias("sku_id"),
        _d("cart_price").alias("cart_price"),
        sku_num_delta.alias("sku_num"),
        _d("sku_name").alias("sku_name"),
        _d("is_checked").alias("is_checked"),
        _d("create_time").alias("create_time"),
        _d("operate_time").alias("operate_time"),
        _d("is_ordered").alias("is_ordered"),
        _d("order_time").alias("order_time"),
        _d("source_type").alias("source_type_id"),
        _d("source_id").alias("source_id"),
    )
    return ci.join(
        F.broadcast(base_dic), ci.source_type_id == base_dic.dic_code, "inner"
    ).select(
        "id",
        "user_id",
        "sku_id",
        "cart_price",
        "sku_num",
        "sku_name",
        "is_checked",
        "create_time",
        "operate_time",
        "is_ordered",
        "order_time",
        "source_type_id",
        F.col("dic_name").alias("source_type_name"),
        "source_id",
    )


def pay_detail_suc(
    topic_db: DataFrame, dwd_order_detail: DataFrame, base_dic: DataFrame
) -> DataFrame:
    """Payment-success fact (reference: RT/app/dwd/DwdTradePayDetailSuc.java:42-120):
    payment_info (update, payment_status='1602') x dwd order detail x dic."""
    pi = topic_db.filter(
        (F.col("table") == "payment_info")
        & (F.col("type") == "update")
        & (_d("payment_status") == "1602")
    ).select(
        _d("user_id").alias("pi_user_id"),
        _d("order_id").alias("pi_order_id"),
        _d("payment_type").alias("payment_type"),
        _d("callback_time").alias("callback_time"),
    )
    od = dwd_order_detail
    return (
        pi.join(od, pi.pi_order_id == od.order_id, "inner")
        .join(F.broadcast(base_dic), pi.payment_type == base_dic.dic_code, "inner")
        .select(
            F.col("id").alias("order_detail_id"),
            "order_id",
            "user_id",
            "sku_id",
            "sku_name",
            "province_id",
            "activity_id",
            "activity_rule_id",
            "coupon_id",
            F.col("payment_type").alias("payment_type_code"),
            F.col("dic_name").alias("payment_type_name"),
            "callback_time",
            "source_id",
            "source_type_id",
            "source_type_name",
            "sku_num",
            "order_price",
            "split_activity_amount",
            "split_coupon_amount",
            F.col("split_total_amount").alias("split_payment_amount"),
        )
    )


def order_refund(topic_db: DataFrame, base_dic: DataFrame) -> DataFrame:
    """Refund-request fact (reference: RT/app/dwd/DwdTradeOrderRefund.java:62-133):
    order_refund_info (insert) x order_info (update to 1005, old not null)
    x dic twice (refund type + reason) — the double-role lookup join J4."""
    ri = topic_db.filter(
        (F.col("table") == "order_refund_info") & (F.col("type") == "insert")
    ).select(
        _d("id").alias("id"),
        _d("user_id").alias("user_id"),
        _d("order_id").alias("order_id"),
        _d("sku_id").alias("sku_id"),
        _d("refund_type").alias("refund_type"),
        _d("refund_num").alias("refund_num"),
        _d("refund_amount").alias("refund_amount"),
        _d("refund_reason_type").alias("refund_reason_type"),
        _d("refund_reason_txt").alias("refund_reason_txt"),
        _d("create_time").alias("create_time"),
        F.col("ts"),
    )
    oi = topic_db.filter(
        (F.col("table") == "order_info")
        & (F.col("type") == "update")
        & (_d("order_status") == "1005")
        & _old("order_status").isNotNull()
    ).select(
        _d("id").alias("oi_id"),
        _d("province_id").alias("province_id"),
    )
    type_dic = base_dic.select(
        F.col("dic_code").alias("type_dic_code"), F.col("dic_name").alias("refund_type_name")
    )
    reason_dic = base_dic.select(
        F.col("dic_code").alias("reason_dic_code"),
        F.col("dic_name").alias("refund_reason_type_name"),
    )
    return (
        ri.join(oi, ri.order_id == oi.oi_id, "inner")
        .join(F.broadcast(type_dic), ri.refund_type == type_dic.type_dic_code, "inner")
        .join(
            F.broadcast(reason_dic),
            ri.refund_reason_type == reason_dic.reason_dic_code,
            "inner",
        )
        .select(
            "id",
            "user_id",
            "order_id",
            "sku_id",
            "province_id",
            _date_id(F.col("create_time")).alias("date_id"),
            "create_time",
            F.col("refund_type").alias("refund_type_code"),
            "refund_type_name",
            F.col("refund_reason_type").alias("refund_reason_type_code"),
            "refund_reason_type_name",
            "refund_reason_txt",
            "refund_num",
            "refund_amount",
            "ts",
        )
    )


def refund_pay_suc(topic_db: DataFrame, base_dic: DataFrame) -> DataFrame:
    """Refund-payment-success fact (reference:
    RT/app/dwd/DwdTradeRefundPaySuc.java:65-143): refund_payment x
    order_info (update to 1006) x order_refund_info on the composite
    (order_id, sku_id) key x dic."""
    rp = topic_db.filter(F.col("table") == "refund_payment").select(
        _d("id").alias("id"),
        _d("order_id").alias("order_id"),
        _d("sku_id").alias("sku_id"),
        _d("payment_type").alias("payment_type"),
        _d("callback_time").alias("callback_time"),
        _d("total_amount").alias("total_amount"),
        F.col("ts"),
    )
    oi = topic_db.filter(
        (F.col("table") == "order_info")
        & (F.col("type") == "update")
        & (_d("order_status") == "1006")
        & _old("order_status").isNotNull()
    ).select(
        _d("id").alias("oi_id"),
        _d("user_id").alias("user_id"),
        _d("province_id").alias("province_id"),
    )
    ri = topic_db.filter(F.col("table") == "order_refund_info").select(
        _d("order_id").alias("ri_order_id"),
        _d("sku_id").alias("ri_sku_id"),
        _d("refund_num").alias("refund_num"),
    )
    return (
        rp.join(oi, rp.order_id == oi.oi_id, "inner")
        .join(
            ri,
            (rp.order_id == ri.ri_order_id) & (rp.sku_id == ri.ri_sku_id),
            "inner",
        )
        .join(F.broadcast(base_dic), rp.payment_type == base_dic.dic_code, "inner")
        .select(
            "id",
            "user_id",
            "order_id",
            "sku_id",
            "province_id",
            F.col("payment_type").alias("payment_type_code"),
            F.col("dic_name").alias("payment_type_name"),
            _date_id(F.col("callback_time")).alias("date_id"),
            "callback_time",
            "refund_num",
            "total_amount",
            "ts",
        )
    )
