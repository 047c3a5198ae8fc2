"""Single-table DWD CDC pipelines (filter + map-key projection).

Each function consumes the structured ``topic_db`` CDC stream
(database/table/type/data/old/ts) and emits the all-string DWD contract of
the corresponding reference job. Predicates are verbatim from the reference
(file:line cited per function).

These are pure Catalyst plans: a parquet scan -> constant-foldable
``table``/``type`` filters -> map-subscript projections. No shuffle, no UDF;
at 100 TB each is an embarrassingly parallel single pass.
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


def dwd_user_register(topic_db: DataFrame) -> DataFrame:
    """User registration facts.

    Reference: RT/app/dwd/DwdUserRegister.java:54-80 —
    ``table='user_info' AND type='insert'``, project user_id/date_id/
    create_time/ts.
    """
    return topic_db.filter(
        (F.col("table") == "user_info") & (F.col("type") == "insert")
    ).select(
        _d("id").alias("user_id"),
        _date_id(_d("create_time")).alias("date_id"),
        _d("create_time").alias("create_time"),
        F.col("ts"),
    )


def dwd_tool_coupon_get(topic_db: DataFrame) -> DataFrame:
    """Coupon grants. Reference: RT/app/dwd/DwdToolCouponGet.java:54-65 —
    ``table='coupon_use' AND type='insert'``."""
    return topic_db.filter(
        (F.col("table") == "coupon_use") & (F.col("type") == "insert")
    ).select(
        _d("id").alias("id"),
        _d("coupon_id").alias("coupon_id"),
        _d("user_id").alias("user_id"),
        _date_id(_d("get_time")).alias("date_id"),
        _d("get_time").alias("get_time"),
        F.col("ts"),
    )


def dwd_tool_coupon_order(topic_db: DataFrame) -> DataFrame:
    """Coupon used-at-order. Reference: RT/app/dwd/DwdToolCouponOrder.java:56-69
    — ``type='update' AND data['coupon_status']='1402' AND
    old['coupon_status']='1401'``."""
    return topic_db.filter(
        (F.col("table") == "coupon_use")
        & (F.col("type") == "update")
        & (_d("coupon_status") == "1402")
        & (_old("coupon_status") == "1401")
    ).select(
        _d("id").alias("id"),
        _d("coupon_id").alias("coupon_id"),
        _d("user_id").alias("user_id"),
        _d("order_id").alias("order_id"),
        _date_id(_d("using_time")).alias("date_id"),
        _d("using_time").alias("using_time"),
        F.col("ts"),
    )


def dwd_tool_coupon_pay(topic_db: DataFrame) -> DataFrame:
    """Coupon redeemed-at-pay. Reference: RT/app/dwd/DwdToolCouponPay.java:55-67
    — ``type='update' AND data['used_time'] IS NOT NULL``."""
    return topic_db.filter(
        (F.col("table") == "coupon_use")
        & (F.col("type") == "update")
        & _d("used_time").isNotNull()
    ).select(
        _d("id").alias("id"),
        _d("coupon_id").alias("coupon_id"),
        _d("user_id").alias("user_id"),
        _d("order_id").alias("order_id"),
        _date_id(_d("used_time")).alias("date_id"),
        _d("used_time").alias("used_time"),
        F.col("ts"),
    )


def dwd_interaction_favor_add(topic_db: DataFrame) -> DataFrame:
    """Favor (wishlist) additions.

    Reference: RT/app/dwd/DwdInteractionFavorAdd.java:56-66 —
    ``table='favor_info' AND (type='insert' OR (type='update' AND
    data['is_cancel']='0'))``.
    """
    return topic_db.filter(
        (F.col("table") == "favor_info")
        & (
            (F.col("type") == "insert")
            | ((F.col("type") == "update") & (_d("is_cancel") == "0"))
        )
    ).select(
        _d("id").alias("id"),
        _d("user_id").alias("user_id"),
        _d("sku_id").alias("sku_id"),
        _date_id(_d("create_time")).alias("date_id"),
        _d("create_time").alias("create_time"),
        F.col("ts"),
    )


def dwd_interaction_comment(topic_db: DataFrame, base_dic: DataFrame) -> DataFrame:
    """Comments decoded against base_dic (appraise code -> name).

    Reference: RT/app/dwd/DwdInteractionComment.java:62-95 — insert filter +
    ``FOR SYSTEM_TIME AS OF`` lookup join on ``appraise = dic_code``. Spark:
    a broadcast hash join against the dim snapshot (the lookup-cache and
    proc-time machinery collapse into this; see SURVEY.md J3).
    """
    ci = topic_db.filter(
        (F.col("table") == "comment_info") & (F.col("type") == "insert")
    ).select(
        _d("id").alias("id"),
        _d("user_id").alias("user_id"),
        _d("sku_id").alias("sku_id"),
        _d("order_id").alias("order_id"),
        _date_id(_d("create_time")).alias("date_id"),
        _d("create_time").alias("create_time"),
        _d("appraise").alias("appraise_code"),
        F.col("ts"),
    )
    return ci.join(
        F.broadcast(base_dic), ci.appraise_code == base_dic.dic_code, "inner"
    ).select(
        "id",
        "user_id",
        "sku_id",
        "order_id",
        "date_id",
        "create_time",
        "appraise_code",
        F.col("dic_name").alias("appraise_name"),
        "ts",
    )
