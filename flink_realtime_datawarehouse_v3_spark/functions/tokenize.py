"""U1: keyword tokenizer (the reference's only UDTF).

Reference: RT/app/func/SplitFunction.java:17-35 + RT/utils/KeywordUtil.java:18-37
— an IK-Analyzer Chinese segmentation TableFunction invoked via
``LATERAL TABLE(SplitFunction(item))``. IK segmentation is not reproducible
bit-for-bit in Python (SURVEY.md §7.3), so the engine ships a deterministic
whitespace/punctuation tokenizer with the same operator shape
(string -> array<string> -> explode).

Four implementations:
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
- :class:`SplitWordsUDTF` — a REAL Python UDTF registered for SQL
  ``LATERAL`` invocation (the reference's exact TableFunction surface),
  Arrow-optimized; exercised end-to-end by dws_keyword_window_udtf_sql.
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


# --- dictionary-driven CJK segmentation (IK-Analyzer parity plug) -----------
#
# The reference's KeywordUtil (RT/utils/KeywordUtil.java:18-37) runs
# IK-Analyzer smart segmentation over Chinese search keywords. IK's core
# mechanism is dictionary-driven maximum matching; this ships the same
# mechanism — greedy forward maximum match (FMM) over a bundled dictionary,
# single-character fallback — deterministically, with the DuckDB oracle
# computing the identical segmentation via a recursive longest-prefix CTE.
# The dictionary is a parameter (a real deployment loads IK's main dict);
# segmentation here is a pure function of (text, dict) on both engines.

CJK_DICT: list[str] = [
    "数据仓库", "大数据", "数据", "仓库", "实时", "流式",
    "处理", "引擎", "分析", "计算", "窗口", "聚合",
]

# Deterministic synthetic search phrases the CJK keyword-window entry maps
# log rows onto (ts % len(CJK_PHRASES)); the third exercises the
# single-char fallback (湖 is not in the dictionary).
CJK_PHRASES: list[str] = [
    "实时数据仓库",
    "大数据流式处理",
    "数据湖实时分析",
    "实时窗口聚合计算",
]


def _fmm(text: str | None, dictset: set[str], maxlen: int) -> list[str]:
    """Greedy forward maximum match: at each position take the LONGEST
    dictionary word prefix, else the single character. Mirrors the
    oracle's recursive `ORDER BY length(w) DESC LIMIT 1` CTE exactly
    (a prefix of fixed length is unique, so no tie-break is needed)."""
    if text is None:
        return []
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        match = None
        for length in range(min(maxlen, n - i), 0, -1):
            cand = text[i : i + length]
            if cand in dictset:
                match = cand
                break
        if match is None:
            match = text[i]
        out.append(match)
        i += len(match)
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def segment_cjk_pandas_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched dictionary FMM segmentation over :data:`CJK_DICT`."""
    dictset = set(CJK_DICT)
    maxlen = max(map(len, CJK_DICT))
    return s.map(lambda t: _fmm(t, dictset, maxlen))


class SplitWordsUDTF:
    """U1 as a REAL Python UDTF — the reference's exact invocation surface
    (RT/app/func/SplitFunction.java:17-35 is a Flink TableFunction called
    via ``LATERAL TABLE(SplitFunction(item))``; here the same query reads
    ``... , LATERAL split_function(item)`` in Spark SQL).

    Arrow-optimized (batched transfer); output identical to
    :func:`tokenize`. The Catalyst expression remains the hot path — this
    class exists to prove the engine exposes the UDTF registration +
    SQL-lateral surface a reference user would reach for.
    """

    def eval(self, item):  # noqa: ANN001 - UDTF protocol signature
        if item:
            for w in item.split():
                if w:
                    yield (w,)


def register_split_udtf(spark) -> None:
    """Register ``split_function`` for SQL ``LATERAL`` use (idempotent)."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "split_function",
        udtf(SplitWordsUDTF, returnType="word string", useArrow=True),
    )
