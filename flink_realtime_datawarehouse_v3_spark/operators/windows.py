"""Event-time tumbling-window helpers (SURVEY.md W2: 10 s everywhere).

The reference stamps every DWS row with ``stt``/``edt`` window-bound strings
(DateFormatUtil.toYmdHms — RT/utils/DateFormatUtil.java:44-54) and a
System.currentTimeMillis ``ts``. The emit-time ``ts`` is nondeterministic and
is therefore omitted from our outputs (FIXTURES.md F5 excludes it from
hashes).

Windows align to the epoch (Spark ``window()`` semantics == Flink
TUMBLE == floor(epoch/10)*10), which the DuckDB oracle mirrors with integer
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, GroupedData
from pyspark.sql import functions as F

FMT = "yyyy-MM-dd HH:mm:ss"

TUMBLE = "10 seconds"


def rt_from_ms(ts_ms: Column) -> Column:
    """Flink's ``TO_TIMESTAMP(FROM_UNIXTIME(ts/1000))`` — integer division,
    sub-second truncated (RT/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:52)."""
    return F.timestamp_seconds(F.floor(ts_ms / 1000).cast("long"))


def rt_from_string(ts_str: Column) -> Column:
    return F.to_timestamp(ts_str, FMT)


def tumble(df: DataFrame, rt: Column, *keys: Column | str) -> GroupedData:
    """groupBy(window(rt, 10s), keys) — A3 when no keys, A2/A4 otherwise."""
    return df.groupBy(F.window(rt, TUMBLE).alias("w"), *keys)


def stt_edt() -> list[Column]:
    return [
        F.date_format(F.col("w.start"), FMT).alias("stt"),
        F.date_format(F.col("w.end"), FMT).alias("edt"),
    ]
