"""Dimension tables for the DWS star joins, derived from part/nation.

The reference keeps DIM tables in Phoenix/HBase (all-varchar, runtime
schema — RT/app/func/TableProcessFunction.java:84-106) and joins them with a
hand-rolled async cache-aside pipeline (RT/app/func/DimAsyncFunction.java:21-89,
RT/utils/DimUtil.java:22-63). On Spark those ~400 LoC collapse into broadcast
hash joins against these DataFrames (SURVEY.md J11).

Mapping (mirrored in DuckDB by oracle.CTES['dim_sku'] / ['dim_province']):
- part  -> sku/spu/trademark/category hierarchy:
    sku_id = p_partkey, spu_id = 'spu_' || p_partkey % 500, tm_id = p_brand,
    category3 = p_type || '_' || p_size % 5, category2 = p_type,
    category1 = VALUE (ECONOMY/PROMO/SMALL) or PREMIUM (the rest).
- nation -> province (id = n_nationkey, name = n_name).

All-string columns, Phoenix-style. Each hop of the reference's async chain
(sku -> spu -> trademark -> cat3 -> cat2 -> cat1) is exposed as its own
small DataFrame so the DWS pipelines exercise the same 6-join chain shape —
every one a broadcast join, no shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tables


def _part(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "part")


def _cat3(p: DataFrame):
    return F.concat(p.p_type, F.lit("_"), p.p_size % 5)


def _cat1(p: DataFrame):
    return F.when(p.p_type.isin("ECONOMY", "PROMO", "SMALL"), "VALUE").otherwise(
        "PREMIUM"
    )


def dim_sku_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _part(spark, sf_dir)
    return p.select(
        p.p_partkey.cast("string").alias("id"),
        F.concat(F.lit("spu_"), p.p_partkey % 500).alias("spu_id"),
        p.p_brand.alias("tm_id"),
        _cat3(p).alias("category3_id"),
        F.concat(F.lit("sku_"), p.p_partkey).alias("sku_name"),
    )


def dim_spu_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _part(spark, sf_dir)
    return p.select(
        F.concat(F.lit("spu_"), p.p_partkey % 500).alias("id"),
        F.concat(F.lit("spu_name_"), p.p_partkey % 500).alias("spu_name"),
    ).distinct()


def dim_base_trademark(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _part(spark, sf_dir)
    return p.select(
        p.p_brand.alias("id"),
        F.concat(F.lit("tm_"), p.p_brand).alias("tm_name"),
    ).distinct()


def dim_base_category3(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _part(spark, sf_dir)
    return p.select(
        _cat3(p).alias("id"),
        _cat3(p).alias("name"),
        p.p_type.alias("category2_id"),
    ).distinct()


def dim_base_category2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _part(spark, sf_dir)
    return p.select(
        p.p_type.alias("id"),
        p.p_type.alias("name"),
        _cat1(p).alias("category1_id"),
    ).distinct()


def dim_base_category1(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _part(spark, sf_dir)
    c1 = _cat1(p)
    return p.select(c1.alias("id"), c1.alias("name")).distinct()


def dim_base_province(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = tables.load(spark, sf_dir, "nation")
    return n.select(
        n.n_nationkey.cast("string").alias("id"),
        n.n_name.alias("name"),
    )


def dim_sku_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 6-hop async dim chain (sku -> spu -> trademark ->
    cat3 -> cat2 -> cat1; RT/app/dws/DwsTradeUserSpuOrderWindow.java:146-278)
    as six chained broadcast hash joins producing one flat sku dim."""
    sku = dim_sku_info(spark, sf_dir)
    spu = dim_spu_info(spark, sf_dir)
    tm = dim_base_trademark(spark, sf_dir)
    c3 = dim_base_category3(spark, sf_dir)
    c2 = dim_base_category2(spark, sf_dir)
    c1 = dim_base_category1(spark, sf_dir)
    return (
        sku.join(F.broadcast(spu), sku.spu_id == spu.id, "inner")
        .drop(spu.id)
        .join(F.broadcast(tm), sku.tm_id == tm.id, "inner")
        .drop(tm.id)
        .join(F.broadcast(c3), sku.category3_id == c3.id, "inner")
        .drop(c3.id)
        .withColumnRenamed("name", "category3_name")
        .join(F.broadcast(c2), F.col("category2_id") == c2.id, "inner")
        .drop(c2.id)
        .withColumnRenamed("name", "category2_name")
        .join(F.broadcast(c1), F.col("category1_id") == c1.id, "inner")
        .drop(c1.id)
        .withColumnRenamed("name", "category1_name")
        .withColumnRenamed("id", "sku_id")
    )
