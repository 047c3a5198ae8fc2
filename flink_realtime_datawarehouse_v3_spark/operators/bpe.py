"""BPE tokenizer induction (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the tokenizer-training
stage of a training-data pipeline, structured the way it actually runs
over a 100 TB corpus:

1. ``word_counts`` — ONE distributed word-count pass (the only
   full-corpus scan). The (word, count) table is the complete sufficient
   statistic for classic BPE: merge decisions depend only on word
   frequencies, never on document structure.
2. ``_learned_merges`` — the merge loop runs on a bounded
   top-``vocab_cap`` slice of that table (same bounded-artifact posture
   as the IVF/PQ codebook training in ``simsearch.py``: the collect is
   capped by ``vocab_cap``, so nothing driver-side scales with corpus
   size; real vocabularies plateau in the low millions regardless of
   corpus bytes). The fit is memoized per (session, input plan, params)
   via the shared ``_artifact`` memo, so the merges entry and the encode
   entry pay the word-count job and the fit ONCE per sweep.
3. ``encode`` — applying the learned merges corpus-wide is the
   distributed pass again: a vectorized Arrow ``mapInPandas`` with a
   per-batch word cache (tokenizing is per-word, and batches are heavy
   in repeated words, so the cache makes the hot path a dict lookup).

No reference-parity citation: the reference system has no tokenizer
surface; this extends the beyond-reference LLM-pipeline family.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .simsearch import _artifact
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


def _word_pairs(sym: tuple[str, ...]) -> Iterator[tuple[str, str]]:
    for i in range(len(sym) - 1):
        yield (sym[i], sym[i + 1])


def train_merges(
    word_freq: Iterable[tuple[str, int]], n_merges: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """Classic Sennrich merge loop over a (word, count) table, with the
    reference implementation's INCREMENTAL pair-count maintenance: each
    round re-counts only the words that contain the merged pair (tracked
    by a pair -> word-indices index), not the whole vocab — a full
    recount per round is O(n_merges x total_pairs) and dominates at a
    filled 262k vocab cap. Fully deterministic: ties break on the
    lexicographically smallest pair. Returns [(left, right, pair_count)]
    in merge order."""
    agg: dict[tuple[str, ...], int] = {}
    for w, c in word_freq:
        agg[tuple(w)] = agg.get(tuple(w), 0) + c
    words: list[tuple[str, ...]] = list(agg.keys())
    counts: list[int] = [agg[w] for w in words]
    pairs: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, sym in enumerate(words):
        for p in _word_pairs(sym):
            pairs[p] = pairs.get(p, 0) + counts[wi]
            index.setdefault(p, set()).add(wi)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append((best[0], best[1], pairs[best]))
        for wi in sorted(index.get(best, ())):
            old = words[wi]
            c = counts[wi]
            # per-word pair MULTISETS: a pair can occur several times in
            # one word ("cdcd" has (c,d) twice), so subtract c per
            # occurrence and drop the index entry exactly once.
            for p, k in Counter(_word_pairs(old)).items():
                left = pairs[p] - c * k
                if left:
                    pairs[p] = left
                else:
                    del pairs[p]
                s = index[p] if left else index.pop(p, set())
                s.discard(wi)
                if not s and left:
                    del index[p]
            new = _merge_word(old, best)
            words[wi] = new
            for p, k in Counter(_word_pairs(new)).items():
                pairs[p] = pairs.get(p, 0) + c * k
                index.setdefault(p, set()).add(wi)
    return merges


def _learned_merges(
    corpus: DataFrame, n_merges: int, vocab_cap: int
) -> list[tuple[str, str, int]]:
    """Memoized bounded-vocab fit: top-``vocab_cap`` words by (count
    desc, word asc) — a deterministic bounded artifact, like an IVF
    codebook, NOT a corpus-sized pull."""

    def fit() -> list[tuple[str, str, int]]:
        top = (
            word_counts(corpus)
            .orderBy(F.desc("wc"), F.asc("word"))
            .limit(vocab_cap)
            .collect()
        )
        return train_merges([(r.word, r.wc) for r in top], n_merges)

    return _artifact(
        corpus.sparkSession, corpus, "bpe", (n_merges, vocab_cap), fit
    )


def bpe_merges(
    corpus: DataFrame,
    n_merges: int = N_MERGES,
    vocab_cap: int = VOCAB_CAP,
) -> DataFrame:
    """Learned merge table as a DataFrame: (rank, left, right, merged,
    pair_count)."""
    return corpus.sparkSession.createDataFrame(
        [
            (i + 1, a, b, a + b, int(c))
            for i, (a, b, c) in enumerate(
                _learned_merges(corpus, n_merges, vocab_cap)
            )
        ],
        "rank int, left string, right string, merged string, pair_count bigint",
    )


def merges_sql(n_merges: int = N_MERGES, vocab_cap: int = VOCAB_CAP) -> str:
    """Independent DuckDB replay of the ENTIRE fit — word count, bounded
    top-``vocab_cap`` slice, and the ``n_merges``-step greedy merge loop —
    as a MATERIALIZED CTE chain (the r12 trained-artifact pattern, but
    stronger: nothing from the Spark fit is embedded; the oracle re-derives
    the merge table from the raw corpus).

    Per step i: (1) pair counts from the current segmentation via
    ``UNNEST(list_transform(range(len(ss)-1), ...))`` — overlapping
    adjacent positions weighted by word count, exactly the Python
    trainer's multiset semantics; (2) argmin by (-count, pair) via
    ``ORDER BY pc DESC, a, b LIMIT 1`` (DuckDB's binary UTF-8 collation ==
    Python code-point tuple order); (3) left-to-right non-overlapping
    merge application via ``replace()`` on a wrapped form where EVERY
    symbol carries its own '|' delimiters (``|a||b||c|``) so consecutive
    pairs never share a boundary char ('abab' merges to 'ab','ab', not
    once).

    Boundary: the wrapped form requires '|'-free symbols; the synthetic
    corpus is printable-ASCII without '|' (asserted in
    tests/test_training_ops.py). The Spark fit itself has no such limit.

    Returns a WITH-extension body (starts with ", wc AS ...") for
    ``_csql``-style composition after the corpus CTE.
    """
    ctes = _merge_chain_ctes(n_merges, vocab_cap)
    body = "\nUNION ALL\n".join(
        f'SELECT {i} AS rank, a AS "left", b AS "right", a || b AS merged,'
        f" pc AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        ", "
        + ",\n".join(ctes)
        + "\nSELECT * FROM (\n"
        + body
        + "\n) ORDER BY rank"
    )


def _merge_chain_ctes(n_merges: int, vocab_cap: int) -> list[str]:
    """The shared fit-replay CTE chain (wc, s0, b1..bN, s1..sN) — see
    :func:`merges_sql` for the semantics and the '|' boundary."""
    ctes = [
        f"""wc AS MATERIALIZED (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
  FROM corpus, UNNEST(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
       AS t(w)
  GROUP BY 1 ORDER BY cnt DESC, word ASC LIMIT {vocab_cap})""",
        "s0 AS MATERIALIZED (SELECT word, cnt, string_split(word, '') AS ss FROM wc)",
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        ctes.append(
            f"""b{i} AS MATERIALIZED (
  SELECT pr.a AS a, pr.b AS b, CAST(sum(cnt) AS BIGINT) AS pc
  FROM s{p}, UNNEST(list_transform(range(len(ss)-1),
       j -> {{'a': ss[j+1], 'b': ss[j+2]}})) AS t(pr)
  GROUP BY 1, 2 ORDER BY pc DESC, a ASC, b ASC LIMIT 1)"""
        )
        ctes.append(
            f"""s{i} AS MATERIALIZED (
  SELECT word, cnt, string_split(substr(r, 2, length(r) - 2), '||') AS ss
  FROM (SELECT word, cnt,
          replace('|' || array_to_string(ss, '||') || '|',
                  '|' || b.a || '||' || b.b || '|',
                  '|' || b.a || b.b || '|') AS r
        FROM s{p}, b{i} AS b))"""
        )
    return ctes


def encode_sql(n_merges: int = N_MERGES, vocab_cap: int = VOCAB_CAP) -> str:
    """Independent DuckDB replay of the ENCODE pass (r13): re-derives the
    merge table via the :func:`merges_sql` chain, then applies the learned
    merges to EVERY distinct corpus word (not just the capped fit slice —
    exactly what the distributed ``encode`` does) as a rank-ordered
    ``replace()`` chain on the same wrapped form, and finally joins each
    doc's token multiset to its word's final segmentation length.

    The oracle-side per-distinct-word apply is bounded by the TEST
    corpus's vocabulary; the Spark side stays the scale path (Arrow
    ``mapInPandas`` with a per-batch word cache). Empty-token docs keep
    their (0, 0) row via the left join + coalesce.
    """
    ctes = _merge_chain_ctes(n_merges, vocab_cap)
    # every distinct word in the corpus, char-split
    ctes.append(
        """aw0 AS MATERIALIZED (
  SELECT DISTINCT w AS word, string_split(w, '') AS ss
  FROM corpus, UNNEST(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
       AS t(w))"""
    )
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""aw{i} AS MATERIALIZED (
  SELECT word, string_split(substr(r, 2, length(r) - 2), '||') AS ss
  FROM (SELECT word,
          replace('|' || array_to_string(ss, '||') || '|',
                  '|' || b.a || '||' || b.b || '|',
                  '|' || b.a || b.b || '|') AS r
        FROM aw{i - 1}, b{i} AS b))"""
        )
    ctes.append(
        f"""seg AS MATERIALIZED (
  SELECT word, CAST(len(ss) AS BIGINT) AS n_sub FROM aw{n_merges})"""
    )
    ctes.append(
        """doc_words AS (
  SELECT doc_id, w AS word
  FROM corpus, UNNEST(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
       AS t(w)),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens
  FROM doc_words JOIN seg USING (word) GROUP BY 1)"""
    )
    return (
        ", "
        + ",\n".join(ctes)
        + """
SELECT c.doc_id,
       COALESCE(p.n_words, 0) AS n_words,
       COALESCE(p.n_bpe_tokens, 0) AS n_bpe_tokens
FROM corpus c LEFT JOIN per_doc p USING (doc_id)"""
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
    merges = [
        (a, b) for a, b, _ in _learned_merges(corpus, n_merges, vocab_cap)
    ]

    def batches(it: Iterator) -> Iterator:
        import re

        # Same tokenization as the training pass: text_analysis.tokens()
        # splits on the JAVA regex \s+ (ASCII whitespace only, empties
        # dropped). pandas str.split() splits on UNICODE whitespace, so
        # text containing e.g.   would yield words the merge table
        # was never trained on — re.ASCII pins \s to the Java set.
        ascii_ws = re.compile(r"\s+", re.ASCII)
        _FS_CONTROLS = re.compile("[\x1c-\x1f]")

        def jsplit(t: str) -> list[str]:
            # Fast path: for ASCII text (the common case) str.split() is
            # the Java \s+ split at C speed — BUT Python str.split() also
            # splits on the \x1c-\x1f separator controls, which Java \s+
            # (the training tokenization) does not, so rows containing
            # any of them take the regex path to keep encode-time word
            # segmentation identical to the merge-table training. Only
            # non-ASCII / control-bearing rows pay the regex (regex on
            # every row measured ~4x the whole encode stage at sf0.1).
            if t.isascii() and not _FS_CONTROLS.search(t):
                return t.split()
            return [w for w in ascii_ws.split(t) if w]

        cache: dict[str, tuple[str, ...]] = {}
        for pdf in it:
            toks = [jsplit(t) for t in pdf["text"]]
            pdf_out = pdf[["doc_id"]].copy()
            pdf_out["n_words"] = [len(words) for words in toks]
            pdf_out["n_bpe_tokens"] = [
                sum(len(_apply_merges(w, merges, cache)) for w in words)
                for words in toks
            ]
            yield pdf_out

    return corpus.mapInPandas(
        batches, "doc_id bigint, n_words bigint, n_bpe_tokens bigint"
    )
