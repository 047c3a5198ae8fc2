"""Query catalog: the driver-facing surface.

``QUERIES`` maps query name -> callable(spark, sf_dir) -> DataFrame (the
Spark pipeline, end-to-end from the parquet tables through ODS synthesis).
``ORACLES`` maps the same names to DuckDB SQL over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings) computing the identical result. Names without an oracle entry
are non-SQL-expressible ops (driver records a rows-only check).

Column names are aligned on both sides (the driver sorts columns by name
before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import oracle
from .plans import dwd_simple
from .sources import cdc, dic

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle_sql: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle_sql is not None:
        ORACLES[name] = oracle_sql


def _cdc(spark: SparkSession, sf_dir: str, only: list[str]) -> DataFrame:
    return cdc.parse_topic_db(cdc.topic_db_json(spark, sf_dir, only=only))


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
