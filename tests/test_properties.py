"""Property-based tests (hypothesis) for the deterministic pure-Python
kernels, plus seeded random-graph checks of the cluster closure against a
union-find reference implementation."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_realtime_datawarehouse_v3_spark.functions import tokenize as tk


# --- FMM segmenter ----------------------------------------------------------

_DICTSET = set(tk.CJK_DICT)
_MAXLEN = max(map(len, tk.CJK_DICT))

# Text over the dictionary's alphabet plus out-of-dictionary chars — the
# regime the segmenter actually runs in.
_cjk_alphabet = sorted({ch for w in tk.CJK_DICT for ch in w}) + list("湖海abc ")


@given(st.text(alphabet=_cjk_alphabet, max_size=60))
@settings(max_examples=200, deadline=None)
def test_fmm_reconstructs_input(text):
    """Segmentation is a partition of the input: concatenating the tokens
    reproduces the text exactly (no char lost, duplicated, or reordered)."""
    assert "".join(tk._fmm(text, _DICTSET, _MAXLEN)) == text


@given(st.text(alphabet=_cjk_alphabet, max_size=60))
@settings(max_examples=200, deadline=None)
def test_fmm_tokens_are_dict_words_or_single_chars(text):
    for tok in tk._fmm(text, _DICTSET, _MAXLEN):
        assert tok in _DICTSET or len(tok) == 1


@given(st.text(alphabet=_cjk_alphabet, max_size=40))
@settings(max_examples=100, deadline=None)
def test_fmm_greedy_longest(text):
    """At every emission point the chosen token is the LONGEST dictionary
    word prefixing the remainder (greedy maximum matching)."""
    toks = tk._fmm(text, _DICTSET, _MAXLEN)
    rest = text
    for tok in toks:
        for length in range(min(_MAXLEN, len(rest)), len(tok), -1):
            assert rest[:length] not in _DICTSET, (rest, tok)
        rest = rest[len(tok):]


# --- BPE inference ----------------------------------------------------------

_RANKS = {pair: i for i, pair in enumerate(tk.BPE_MERGES)}


@given(st.text(alphabet="abcdefghinoprstu", min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_bpe_word_reconstructs(word):
    """BPE merges never lose characters: concatenated parts == word."""
    assert "".join(tk._bpe_word(word, _RANKS)) == word


@given(st.text(alphabet="abcdefghinoprstu", min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_bpe_no_remaining_merge(word):
    """On termination no adjacent pair is still mergeable."""
    parts = tk._bpe_word(word, _RANKS)
    for x, y in zip(parts, parts[1:]):
        assert (x, y) not in _RANKS, parts


# --- cluster closure vs union-find reference --------------------------------


def _union_find_clusters(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label representative per node
    return {v: min(u for u in range(n_nodes) if find(u) == find(v)) for v in range(n_nodes)}


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_cluster_closure_matches_union_find(spark, seed):
    """Large-star/small-star on a seeded random graph must produce exactly
    the components (with min-id labels) a union-find reference computes."""
    import pyspark.sql.functions as F

    from flink_realtime_datawarehouse_v3_spark.operators import text_dedup

    rng = random.Random(seed)
    n = 40
    edges = sorted(
        {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randint(5, 35))
        }
    )
    expected = _union_find_clusters(n, edges)
    pairs = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "a long, b long, jaccard double"
    )
    corpus = spark.range(n).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.cluster_id
        for r in text_dedup.dedup_clusters(corpus, pairs).collect()
    }
    assert got == expected
