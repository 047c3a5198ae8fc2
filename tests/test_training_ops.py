"""Oracle parity + property tests for the training-data operators."""

from __future__ import annotations

import pytest

from flink_realtime_datawarehouse_v3_spark import api

from .conftest import SF_SMOKE, assert_parity

ORACLED = [
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_corpus_clean",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "simsearch_cosine_topk",
    "dedup_embedding_cosine",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frame_sample",
    "text_sample_stratified",
]


@pytest.mark.parametrize("name", ORACLED)
def test_parity(spark, duck, name):
    df = api.QUERIES[name](spark, SF_SMOKE)
    assert_parity(df, duck, api.ORACLES[name], name)


def test_minhash_recall(spark):
    """Banded MinHash must recover most exact-Jaccard pairs (and only
    report verified-true pairs)."""
    exact = {
        (r.a, r.b)
        for r in api.QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    }
    lsh = {
        (r.a, r.b)
        for r in api.QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    }
    assert lsh <= exact  # verify step guarantees precision 1.0
    assert exact, "corpus must contain near-dup pairs"
    assert len(lsh) / len(exact) >= 0.8  # banded recall


def test_ivf_recall(spark):
    """IVF probing must recover most brute-force top-10 neighbors."""
    brute = {
        (r.q_id, r.neighbor_id)
        for r in api.QUERIES["simsearch_cosine_topk"](spark, SF_SMOKE).collect()
    }
    ivf = {
        (r.q_id, r.neighbor_id)
        for r in api.QUERIES["simsearch_ivf_topk"](spark, SF_SMOKE).collect()
    }
    assert brute
    assert len(brute & ivf) / len(brute) >= 0.5


def test_embedding_near_dup_pairs_shape(spark):
    df = api.QUERIES["dedup_embedding_cosine"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows, "synthetic near-dup embeddings must be detected"
    for r in rows:
        assert r.a < r.b and r.cosine_sim >= 0.97


def test_dedup_cluster_keep(spark, duck):
    """Connected components over near-dup pairs: transitive closure holds,
    exactly one keeper per cluster, oracle parity."""
    from .conftest import assert_parity

    df = api.QUERIES["dedup_cluster_keep"](spark, SF_SMOKE)
    rows = {r.doc_id: r for r in df.collect()}
    pairs = api.QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    assert pairs, "corpus must contain near-dup pairs"
    for p in pairs:  # transitivity: linked docs share a cluster
        assert rows[p.a].cluster_id == rows[p.b].cluster_id
    clusters = {}
    for r in rows.values():
        clusters.setdefault(r.cluster_id, []).append(r)
    for cid, members in clusters.items():
        assert sum(m.keep for m in members) == 1
        assert min(m.doc_id for m in members) == cid
    assert_parity(df, duck, api.ORACLES["dedup_cluster_keep"], "dedup_cluster_keep")


def test_sample_stratified(spark, duck):
    """Deterministic stratified sample: subset of corpus, rate-plausible,
    rerun-identical, oracle parity."""
    from .conftest import assert_parity

    df = api.QUERIES["text_sample_stratified"](spark, SF_SMOKE)
    a = sorted((r.doc_id, r.lang_pred) for r in df.collect())
    b = sorted((r.doc_id, r.lang_pred) for r in df.collect())
    assert a == b and a, "sample must be deterministic and non-empty"
    n_corpus = api.QUERIES["text_lang_id"](spark, SF_SMOKE).count()
    assert len(a) < n_corpus  # it actually downsamples
    assert_parity(
        df, duck, api.ORACLES["text_sample_stratified"], "text_sample_stratified"
    )
