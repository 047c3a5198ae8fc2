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
    "multimodal_frame_sample",
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
