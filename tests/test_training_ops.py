"""Oracle parity + property tests for the training-data operators."""

from __future__ import annotations

import pytest

from flink_realtime_datawarehouse_v3_spark import api

from .conftest import SF_SMOKE, assert_parity

ORACLED = [
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_chunk_tokens",
    "text_pii_scrub",
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
    "decontaminate_ngram",
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


def test_chunk_tokens_coverage_and_overlap(spark):
    """Every token of every doc lands in a chunk; consecutive chunks share
    exactly `overlap` tokens (except a clamped final chunk); chunk order
    reassembles the document."""
    from flink_realtime_datawarehouse_v3_spark.operators.text_analysis import (
        chunk_tokens,
    )
    from flink_realtime_datawarehouse_v3_spark.sources.corpus import corpus

    c, o, s = 32, 8, 24
    docs = {
        r.doc_id: r.text.split() for r in corpus(spark, SF_SMOKE).collect()
    }
    chunks: dict = {}
    for r in chunk_tokens(corpus(spark, SF_SMOKE), c, o).collect():
        chunks.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text.split()
        assert r.n_tokens_chunk == len(r.chunk_text.split()) or (
            r.n_tokens_chunk == 0 and r.chunk_text == ""
        )
    assert set(chunks) == set(docs)
    for doc_id, toks in docs.items():
        by_idx = chunks[doc_id]
        assert sorted(by_idx) == list(range(len(by_idx)))
        for k, piece in by_idx.items():
            assert piece == toks[k * s : k * s + c]
        # coverage: last chunk reaches the final token
        last = max(by_idx)
        assert last * s + len(by_idx[last]) == len(toks)


def test_pii_scrub_redacts_and_counts(spark):
    """Injected emails and long numbers are fully redacted, counts match
    the injection rule, and untouched docs pass through verbatim."""
    from flink_realtime_datawarehouse_v3_spark.operators.text_analysis import (
        pii_inject,
        pii_scrub,
    )
    from flink_realtime_datawarehouse_v3_spark.sources.corpus import corpus

    raw = {r.doc_id: r.text for r in corpus(spark, SF_SMOKE).collect()}
    out = {r.doc_id: r for r in pii_scrub(corpus(spark, SF_SMOKE)).collect()}
    assert set(out) == set(raw)
    n_injected = 0
    for doc_id, r in out.items():
        assert "@" not in r.clean_text
        assert r.n_emails == (1 if doc_id % 5 == 0 else 0)
        assert r.n_longnums == (1 if doc_id % 11 == 0 else 0)
        if doc_id % 5 == 0:
            assert "<EMAIL>" in r.clean_text
            n_injected += 1
        if doc_id % 11 == 0:
            assert "<NUM>" in r.clean_text
        if doc_id % 5 and doc_id % 11:
            assert r.clean_text == raw[doc_id]
    assert n_injected > 0
    # the injection fixture itself is what the scrubber saw
    injected = {r.doc_id: r.text for r in pii_inject(corpus(spark, SF_SMOKE)).collect()}
    assert all("@example.com" in injected[d] for d in injected if d % 5 == 0)
