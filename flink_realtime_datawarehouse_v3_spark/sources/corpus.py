"""Document corpus for the dedup/text operators.

The driver's ``documents`` table has no duplicates (500 unique texts at
sf0.01), so the dedup operators would be vacuous on it. The corpus expands
it deterministically (mirrored by oracle CTE ``corpus``):

- every doc as-is;
- exact duplicates (doc_id + 1_000_000) for doc_id % 10 == 0;
- near duplicates (doc_id + 2_000_000, two tokens appended) for
  doc_id % 7 == 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tables

NEAR_SUFFIX = " appended nearduplicate"


def corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # documents.parquet is one small file -> one input split, but every
    # consumer (shingling, hashing, signatures) is CPU-bound per row; spread
    # to full parallelism up front. At 100 TB the source is already wide and
    # this round-robin of (id, text) rows is noise.
    par = spark.sparkContext.defaultParallelism
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text").repartition(par)
    exact = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_SUFFIX)).alias("text"),
    )
    return d.unionByName(exact).unionByName(near)


CORPUS_SQL = f"""
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 2000000, text || '{NEAR_SUFFIX}' FROM documents
    WHERE doc_id % 7 = 0
)
"""


def emb_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings plus deterministic near-duplicates (vec_id % 9 == 0 ->
    vec_id + 1_000_000 with dim 0 shifted by +0.05), so the embedding
    near-dup operator has true positives to find. Mirrored by
    ``EMB_CORPUS_SQL``; all values as array<double> on both engines."""
    par = spark.sparkContext.defaultParallelism
    e = (
        tables.load(spark, sf_dir, "embeddings")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
        .repartition(par)
    )
    near = e.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.05)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    return e.unionByName(near)


EMB_CORPUS_SQL = """
emb AS (
    SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000,
           list_concat([embedding[1]::DOUBLE + 0.05], (embedding::DOUBLE[])[2:])
    FROM embeddings WHERE vec_id % 9 = 0
)
"""
