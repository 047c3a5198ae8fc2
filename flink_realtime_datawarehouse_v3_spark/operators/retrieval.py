"""Hybrid sparse+dense retrieval — the production search shape (BM25
keyword recall fused with embedding similarity) over the documents and
embeddings tables.

Scale shape: the dense arm is ONE projection over the embedding table
against a single broadcast query vector (no pairwise anything); the
sparse arm is the shared BM25 scoring pass (term-filtered exploded
token stream — the shuffle carries |docs| x |query| rows at most); the
fusion is a doc_id equi-join of the corpus-scale dense arm with the
hit-only sparse arm, then one global top-k (TakeOrderedAndProject).
Both arms score in integer micro-units so the fused ranking is
engine- and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import simsearch
from . import text_analysis as ta

HYBRID_QUERY_VEC_ID = 0  # the pinned query embedding (a "query doc")


def hybrid_topk(docs: DataFrame, emb: DataFrame, k: int = 20) -> DataFrame:
    """Top-k docs by fused score = BM25 micro-units (0 when no query
    term hits) + cosine micro-units against the pinned query embedding.

    The cosine is rounded to 4 decimals FIRST (the engine-stable
    convention every simsearch oracle uses) and only then scaled to
    micro-units, so the fused integer cannot disagree across engines on
    a float half-way case."""
    # Cast to double BEFORE the cosine (the simsearch._dvec convention):
    # the oracle scores embedding::DOUBLE[], so a float32 dot product
    # here could flip the round(,4) on a half-way case.
    dvec = simsearch._dvec
    qv = (
        emb.filter(F.col("vec_id") == HYBRID_QUERY_VEC_ID)
        .select(dvec(F.col("embedding")).alias("q_vec"))
    )
    # Guard the precondition loudly (the pca_fit empty-sample posture):
    # with no pinned query vector the crossJoin silently returns 0 rows
    # while the oracle's scalar subquery yields NULL cosine and still
    # ranks — a silent parity break. The probe is a pushed-down
    # single-key filter + take(1): bounded, runs once at plan-build.
    if not qv.take(1):
        raise ValueError(
            f"hybrid_topk: query embedding vec_id={HYBRID_QUERY_VEC_ID} "
            "not present in the embeddings table (the dense arm assumes "
            "vec_id and doc_id share an id space)"
        )
    cos4 = F.round(
        simsearch.cosine(dvec(F.col("embedding")), F.col("q_vec")), 4
    )
    dense = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        (F.round(cos4 * 10000).cast("bigint") * 100).alias("cos_micro"),
    )
    sparse = ta.bm25_scores(docs)
    fused = (
        dense.join(sparse, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_terms_hit"), F.lit(0))
            .cast("bigint")
            .alias("n_terms_hit"),
            F.coalesce(F.col("bm25_micro"), F.lit(0))
            .cast("bigint")
            .alias("bm25_micro"),
            "cos_micro",
        )
        .withColumn(
            "combined_micro",
            (F.col("bm25_micro") + F.col("cos_micro")).cast("bigint"),
        )
    )
    w = Window.orderBy(F.col("combined_micro").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id", "n_terms_hit", "bm25_micro", "cos_micro",
            "combined_micro", "rank",
        )
    )
