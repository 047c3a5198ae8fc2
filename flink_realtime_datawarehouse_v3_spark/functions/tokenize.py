"""U1: keyword tokenizer (the reference's only UDTF).

Reference: RT/app/func/SplitFunction.java:17-35 + RT/utils/KeywordUtil.java:18-37
— an IK-Analyzer Chinese segmentation TableFunction invoked via
``LATERAL TABLE(SplitFunction(item))``. IK segmentation is not reproducible
bit-for-bit in Python (SURVEY.md §7.3), so the engine ships a deterministic
whitespace/punctuation tokenizer with the same operator shape
(string -> array<string> -> explode).

Three implementations:
- :func:`tokenize` — pure Catalyst (``split`` + ``filter``), JVM-side,
  whole-stage-codegen'd; the hot path.
- :func:`tokenize_pandas_udf` — Arrow-batched Pandas UDF with IDENTICAL
  output: proves the plug-in point swaps in without changing results
  (gated in tests/test_dws.py::test_keyword_window_segmenter_swap).
- :func:`segment_bpe_pandas_udf` — a deterministic greedy-merge subword
  segmenter (BPE inference over a fixed merges table), the stand-in for a
  real segmenter (IK/jieba/sentencepiece) that genuinely cannot be
  expressed in SQL. Pure Python + pandas, Arrow-batched; the pipeline
  accepts it through the same ``segmenter`` parameter.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tokenize(col: Column) -> Column:
    """Split on runs of whitespace; drop empty tokens. JVM-side."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched variant of :func:`tokenize` (identical output)."""
    return s.str.split()


# A fixed, ordered BPE merges table (highest priority first), the shape a
# trained tokenizer ships: applying merges greedily in priority order over
# the character sequence is exactly BPE inference. Tiny on purpose — the
# point is the deterministic non-SQL control flow, not linguistic quality.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("e", "r"),
    ("a", "n"), ("an", "d"), ("o", "u"), ("r", "e"), ("s", "t"),
]

_PRETOKEN_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")


def _bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    parts = list(word)
    while len(parts) > 1:
        best, best_rank = None, len(ranks)
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and r < best_rank:
                best, best_rank = i, r
        if best is None:
            break
        parts[best : best + 2] = [parts[best] + parts[best + 1]]
    return parts


@F.pandas_udf(T.ArrayType(T.StringType()))
def segment_bpe_pandas_udf(s: pd.Series) -> pd.Series:
    """Greedy BPE-inference subword segmentation, Arrow-batched.

    Lowercase -> regex pre-tokenize (letter runs / digit runs / single
    punctuation) -> per-word greedy merges in :data:`BPE_MERGES` priority
    order. Deterministic for any input; rerun-identical across partitions
    (purely per-row)."""
    ranks = {pair: i for i, pair in enumerate(BPE_MERGES)}

    def seg(text: str | None) -> list[str]:
        if text is None:
            return []
        out: list[str] = []
        for w in _PRETOKEN_RE.findall(text.lower()):
            out.extend(_bpe_word(w, ranks) if w.isalpha() else [w])
        return out

    return s.map(seg)
