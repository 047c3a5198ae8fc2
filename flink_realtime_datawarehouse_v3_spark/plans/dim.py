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


# --- schema evolution: the table_process config as its own changelog ---------
#
# The reference consumes table_process AS A CDC STREAM: when a config row's
# sinkColumns change mid-stream, TableProcessFunction.checkTable issues a
# runtime ALTER-equivalent (Phoenix CREATE TABLE is re-checked per config
# record, RT/app/func/TableProcessFunction.java:84-106) and every data record
# processed AFTER that broadcast update is pruned to the NEW column list —
# records already sunk keep their old shape (NULL in the added column).
#
# Spark-first shape: each config version owns a half-open event-time era
# [effective_ts, next_effective_ts); the routed stream is the union of the
# per-era projections aligned to the MERGED schema (unionByName with
# allowMissingColumns — Spark's schema-merge). The config is a tiny
# driver-side list, so the era predicates compile into the plan as literal
# filters over one cached scan: broadcast by construction, zero shuffle
# added. At 100 TB the data stream pays exactly one extra column of NULLs.

@dataclass(frozen=True)
class ConfigVersion:
    """One table_process changelog entry: ``cfg`` becomes the routing rule
    for records with ``ts >= effective_ts`` (until a later version)."""

    effective_ts: int
    cfg: TableProcess


USER_INFO_EVOLUTION: list[ConfigVersion] = [
    ConfigVersion(0, DIM_CONFIG[0]),
    # v2: the operator widens the dim mid-stream — phone_num starts sinking
    # for records from 2024-01-16 on (epoch 1705363200).
    ConfigVersion(
        1705363200,
        TableProcess("user_info", "dim_user_info", "id,name,phone_num,create_time"),
    ),
]


def route_evolving(topic_db: DataFrame, versions: list[ConfigVersion]) -> DataFrame:
    """Route one dim table under a config CHANGELOG (J10 + runtime schema
    evolution). Output schema is the merged column set across all versions,
    in first-appearance order; a record routed under an era whose config
    lacks a column carries NULL there. Keep-latest per pk runs over the
    merged stream, so a pk updated across a config boundary lands with the
    newest era's shape — exactly the Phoenix-upsert-after-ALTER behavior."""
    assert versions and versions[0].effective_ts == 0, "first era must cover ts=0"
    eras = sorted(versions, key=lambda v: v.effective_ts)
    merged: list[str] = []
    for v in eras:
        merged += [c for c in v.cfg.columns if c not in merged]

    src = topic_db.filter(F.col("table") == eras[0].cfg.source_table)
    parts: list[DataFrame] = []
    for i, v in enumerate(eras):
        lo = v.effective_ts
        hi = eras[i + 1].effective_ts if i + 1 < len(eras) else None
        era = src.filter(F.col("ts").cast("long") >= lo)
        if hi is not None:
            era = era.filter(F.col("ts").cast("long") < hi)
        parts.append(
            era.select(
                *[F.col("data").getItem(c).alias(c) for c in v.cfg.columns],
                F.col("ts").cast("long").alias("__ts"),
                F.when(F.col("type") == "update", 1).otherwise(0).alias("__upd"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    pk = eras[-1].cfg.sink_pk
    return (
        keep_latest(out, [pk], ["__ts", "__upd"])
        .drop("__ts", "__upd")
        .select(*merged)
    )


def scd2_history(topic_db: DataFrame, cfg: TableProcess) -> DataFrame:
    """SCD type-2 dimension history: one row PER VERSION with a half-open
    validity interval, instead of the router's keep-latest (SCD1) collapse.

    The reference's dim layer is SCD1 (Phoenix UPSERT overwrites,
    RT/utils/PhoenixUtil.java:25-44); a warehouse also needs the history
    form for as-of dimension joins. Each CDC record opens a version at its
    ts; ``end_ts`` = the next version's start (NULL while current).

    Scale: one shuffle on the pk for the window (lead + row_number share
    the single sort); (pk, ts) is unique in the changelog so the order —
    and therefore every interval — is total and partitioning-independent.
    """
    from pyspark.sql import Window

    routed = topic_db.filter(F.col("table") == cfg.source_table).select(
        *[F.col("data").getItem(c).alias(c) for c in cfg.columns],
        F.col("ts").cast("long").alias("start_ts"),
    )
    w = Window.partitionBy(cfg.sink_pk).orderBy("start_ts")
    return routed.select(
        *cfg.columns,
        F.row_number().over(w).alias("version"),
        "start_ts",
        F.lead("start_ts").over(w).alias("end_ts"),
        F.lead("start_ts").over(w).isNull().cast("int").alias("is_current"),
    )


def temporal_join_scd2(
    facts: DataFrame, history: DataFrame, pk: str, fact_ts: str,
    dim_cols: list[str],
) -> DataFrame:
    """Event-time temporal join (FlinkSQL ``FOR SYSTEM_TIME AS OF <rowtime>``
    on a versioned table — the event-time form of the reference's
    processing-time lookup join, RT/app/dwd/DwdTradeCartAdd.java:88-89):
    each fact row picks the dim version whose half-open validity interval
    [start_ts, end_ts) contains its event time. Inner semantics: a fact
    before the first version has no as-of row.

    Scale: an equi join on the pk carries the shuffle; the interval
    predicates are post-join filters on the matched pk group (each group
    holds only that key's few versions), so no range-join blowup — the
    standard validity-interval join shape.
    """
    h = history.select(
        F.col(pk).alias("__pk"),
        "start_ts",
        "end_ts",
        *dim_cols,
    )
    return (
        facts.join(h, facts[pk] == h.__pk)
        .filter(
            (F.col("start_ts") <= F.col(fact_ts))
            & (F.col("end_ts").isNull() | (F.col(fact_ts) < F.col("end_ts")))
        )
        .drop("__pk", "start_ts", "end_ts")
    )
