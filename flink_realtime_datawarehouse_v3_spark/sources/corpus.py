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
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
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
