"""DIM layer: config-driven CDC routing (SURVEY.md J10 / P6 / K5).

The reference's DimApp (RT/app/dim/DimApp.java:27-108) consumes the
``table_process`` config table as its own CDC stream, broadcasts it, and
routes every ``topic_db`` record whose table matches a config row into a
Phoenix dim table — creating the table on the fly (all-varchar schema,
RT/app/func/TableProcessFunction.java:84-106) and pruning the JSON payload
to the configured ``sinkColumns`` (:157-175).

Spark-first shape: the config is a small driver-side list (broadcast by
construction), each configured table becomes a filtered projection of the
CDC stream, and the Phoenix UPSERT (RT/utils/PhoenixUtil.java:25-44)
becomes keep-latest-per-pk (batch) / parquet MERGE (streaming,
streaming/dim_app.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import keep_latest


@dataclass(frozen=True)
class TableProcess:
    """One row of the reference's table_process config
    (RT/bean/TableProcess.java:11-22)."""

    source_table: str
    sink_table: str
    sink_columns: str  # CSV, the P6 pruning list
    sink_pk: str = "id"

    @property
    def columns(self) -> list[str]:
        return [c.strip() for c in self.sink_columns.split(",")]


# The dims our synthesized topic_db carries. user_info is insert-only;
# coupon_use has a 3-step lifecycle so the upsert path is exercised.
DIM_CONFIG: list[TableProcess] = [
    TableProcess("user_info", "dim_user_info", "id,name,create_time"),
    TableProcess(
        "coupon_use",
        "dim_coupon_use",
        "id,coupon_id,user_id,order_id,coupon_status,get_time,using_time,used_time",
    ),
]


def route_one(topic_db: DataFrame, cfg: TableProcess) -> DataFrame:
    """Route + prune + upsert-collapse one configured dim table (batch
    form). Output: the configured columns, one row per pk, last writer
    (greatest CDC ts, updates over inserts on ties) wins."""
    routed = topic_db.filter(F.col("table") == cfg.source_table).select(
        *[F.col("data").getItem(c).alias(c) for c in cfg.columns],
        F.col("ts").cast("long").alias("__ts"),
        F.when(F.col("type") == "update", 1).otherwise(0).alias("__upd"),
    )
    return keep_latest(routed, [cfg.sink_pk], ["__ts", "__upd"]).drop("__ts", "__upd")


def dim_tables(topic_db: DataFrame, config: list[TableProcess] | None = None) -> dict[str, DataFrame]:
    cfgs = config if config is not None else DIM_CONFIG
    return {cfg.sink_table: route_one(topic_db, cfg) for cfg in cfgs}
