"""BPE tokenizer induction (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the tokenizer-training
stage of a training-data pipeline, structured the way it actually runs
over a 100 TB corpus:

1. ``word_counts`` — ONE distributed word-count pass (the only
   full-corpus scan). The (word, count) table is the complete sufficient
   statistic for classic BPE: merge decisions depend only on word
   frequencies, never on document structure.
2. ``bpe_merges`` — the merge loop runs on a bounded top-``vocab_cap``
   slice of that table (same bounded-artifact posture as the IVF/PQ
   codebook training in ``simsearch.py``: the collect is capped by
   ``vocab_cap``, so nothing driver-side scales with corpus size; real
   vocabularies plateau in the low millions regardless of corpus bytes).
3. ``encode`` — applying the learned merges corpus-wide is the
   distributed pass again: a vectorized Arrow ``mapInPandas`` with a
   per-batch word cache (tokenizing is per-word, and batches are heavy
   in repeated words, so the cache makes the hot path a dict lookup).

No reference-parity citation: the reference system has no tokenizer
surface; this extends the beyond-reference LLM-pipeline family.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text_analysis import tokens

N_MERGES = 24
VOCAB_CAP = 262_144  # driver-side bound on the merge-loop input


def word_counts(corpus: DataFrame) -> DataFrame:
    """The distributed sufficient statistic: (word, count). One explode +
    one hash agg — map-side partial aggregation collapses repeated words
    before the shuffle, so the exchange carries ~vocab rows per task."""
    return (
        corpus.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_merges(
    word_freq: Iterable[tuple[str, int]], n_merges: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """Classic Sennrich merge loop over a (word, count) table. Fully
    deterministic: ties break on the lexicographically smallest pair.
    Returns [(left, right, pair_count)] in merge order."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_freq:
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append((best[0], best[1], pairs[best]))
        vocab = {
            _merge_word(sym, best): c for sym, c in vocab.items()
        }
    return merges


def bpe_merges(
    corpus: DataFrame,
    n_merges: int = N_MERGES,
    vocab_cap: int = VOCAB_CAP,
) -> DataFrame:
    """Learned merge table as a DataFrame: (rank, left, right, merged,
    pair_count). The collect is the top-``vocab_cap`` words by
    (count desc, word asc) — a deterministic bounded artifact, like an
    IVF codebook, NOT a corpus-sized pull."""
    spark = corpus.sparkSession
    top = (
        word_counts(corpus)
        .orderBy(F.desc("wc"), F.asc("word"))
        .limit(vocab_cap)
        .collect()
    )
    merges = train_merges([(r.word, r.wc) for r in top], n_merges)
    return spark.createDataFrame(
        [
            (i + 1, a, b, a + b, int(c))
            for i, (a, b, c) in enumerate(merges)
        ],
        "rank int, left string, right string, merged string, pair_count bigint",
    )


def _apply_merges(
    word: str, merges: list[tuple[str, str]], cache: dict[str, tuple[str, ...]]
) -> tuple[str, ...]:
    hit = cache.get(word)
    if hit is not None:
        return hit
    sym: tuple[str, ...] = tuple(word)
    for pair in merges:
        if len(sym) == 1:
            break
        sym = _merge_word(sym, pair)
    cache[word] = sym
    return sym


def encode(
    corpus: DataFrame,
    n_merges: int = N_MERGES,
    vocab_cap: int = VOCAB_CAP,
) -> DataFrame:
    """Distributed tokenization with the learned merges: (doc_id,
    n_words, n_bpe_tokens). The merge table rides into every task as a
    tiny closure constant (~n_merges pairs); per-batch word cache keeps
    the hot path a dict lookup."""
    merge_rows = bpe_merges(corpus, n_merges, vocab_cap).collect()
    merges = [(r.left, r.right) for r in sorted(merge_rows, key=lambda r: r.rank)]

    def batches(it: Iterator) -> Iterator:
        cache: dict[str, tuple[str, ...]] = {}
        for pdf in it:
            toks = pdf["text"].str.split()
            pdf_out = pdf[["doc_id"]].copy()
            pdf_out["n_words"] = [len(ws) for ws in toks]
            pdf_out["n_bpe_tokens"] = [
                sum(len(_apply_merges(w, merges, cache)) for w in ws)
                for ws in toks
            ]
            yield pdf_out

    return corpus.mapInPandas(
        batches, "doc_id bigint, n_words bigint, n_bpe_tokens bigint"
    )
