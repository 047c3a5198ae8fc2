"""U1: keyword tokenizer (the reference's only UDTF).

Reference: RT/app/func/SplitFunction.java:17-35 + RT/utils/KeywordUtil.java:18-37
— an IK-Analyzer Chinese segmentation TableFunction invoked via
``LATERAL TABLE(SplitFunction(item))``. IK segmentation is not reproducible
bit-for-bit in Python (SURVEY.md §7.3), so the engine ships a deterministic
whitespace/punctuation tokenizer with the same operator shape
(string -> array<string> -> explode).

Two implementations:
- :func:`tokenize` — pure Catalyst (``split`` + ``filter``), JVM-side,
  whole-stage-codegen'd; used in the hot path.
- :func:`tokenize_pandas_udf` — Arrow-batched Pandas UDF with identical
  output, demonstrating the plug-in point for a real segmenter (jieba/BPE)
  that cannot be expressed in SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tokenize(col: Column) -> Column:
    """Split on runs of whitespace; drop empty tokens. JVM-side."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched variant (swap point for a real segmenter)."""
    return s.str.split()
