"""Traffic (app-log) DWD pipelines: split, is_new repair, UV dedup, bounce.

Reference jobs:
- BaseLogApp (RT/app/dwd/BaseLogApp.java:49-195): parse + dirty side-output,
  per-mid is_new repair (keyed ValueState), 5-way split (err/start/display/
  action/page) with array explosion.
- DwdTrafficUniqueVisitorDetail (RT/app/dwd/DwdTrafficUniqueVisitorDetail.java:53-116):
  session-start filter + per-(mid, day) first-visit dedup (ValueState TTL 1d).
- DwdTrafficUserJumpDetail (RT/app/dwd/DwdTrafficUserJumpDetail.java:60-130):
  CEP bounce detection — session start followed by another session start
  within 10 s (strict next), or timing out with no next event in 10 s.

Batch-parity forms use window functions (SURVEY.md D1/D5); the streaming
variants live in ``streaming/stateful.py``. The is_new repair is the D-layer
keyed-state pattern: batch = first_value over the mid's history.

Scale: the only shuffles are the per-mid window partitions (hash on mid —
high cardinality, well distributed); the split itself is shuffle-free
filter/explode projections off one parsed pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_COMMON = ["ar", "ch", "is_new", "md", "mid", "os", "uid", "vc"]

BOUNCE_WINDOW_MS = 10_000


def _date(ts_ms: Column) -> Column:
    return F.date_format(F.timestamp_millis(ts_ms), "yyyy-MM-dd")


def repair_is_new(parsed: DataFrame) -> DataFrame:
    """P8 new-visitor flag repair (RT/app/dwd/BaseLogApp.java:76-105).

    Keyed ValueState semantics, batch form: the first event of a mid fixes
    the state (its date if it claimed '1', the previous day if it claimed
    '0'); a claim of '1' survives only while the date equals that first-visit
    date. '0' claims always stay '0'.
    """
    w = Window.partitionBy("common.mid").orderBy("ts", "event_id")
    first_claim = F.first("common.is_new").over(w)
    first_date = F.first(_date(F.col("ts"))).over(w)
    repaired = F.when(
        (F.col("common.is_new") == "1")
        & (first_claim == "1")
        & (_date(F.col("ts")) == first_date),
        "1",
    ).otherwise("0")
    return parsed.withColumn(
        "common",
        F.struct(
            F.col("common.ar").alias("ar"),
            F.col("common.ch").alias("ch"),
            repaired.alias("is_new"),
            F.col("common.md").alias("md"),
            F.col("common.mid").alias("mid"),
            F.col("common.os").alias("os"),
            F.col("common.uid").alias("uid"),
            F.col("common.vc").alias("vc"),
        ),
    )


def _flat_common(df: DataFrame, *extra: Column) -> DataFrame:
    return df.select(
        *[F.col(f"common.{c}").alias(c) for c in _COMMON],
        F.col("event_id"),
        F.col("ts"),
        *extra,
    )


def page_log(repaired: DataFrame) -> DataFrame:
    """Main page stream: everything that is not a start event, minus
    displays/actions (RT/app/dwd/BaseLogApp.java:143-166)."""
    return _flat_common(
        repaired.filter(F.col("start").isNull()),
        F.col("page.page_id").alias("page_id"),
        F.col("page.last_page_id").alias("last_page_id"),
        F.col("page.item").alias("item"),
        F.col("page.item_type").alias("item_type"),
        F.col("page.during_time").alias("during_time"),
    )


def start_log(repaired: DataFrame) -> DataFrame:
    return _flat_common(
        repaired.filter(F.col("start").isNotNull()),
        F.col("start.entry").alias("entry"),
        F.col("start.loading_time").alias("loading_time"),
        F.col("start.open_ad_id").alias("open_ad_id"),
        F.col("start.open_ad_ms").alias("open_ad_ms"),
        F.col("start.open_ad_skip_ms").alias("open_ad_skip_ms"),
    )


def error_log(repaired: DataFrame) -> DataFrame:
    """Error stream: any event carrying err (kept alongside its page/start
    emission, as in the reference)."""
    return _flat_common(
        repaired.filter(F.col("err").isNotNull()),
        F.col("err.error_code").alias("error_code"),
        F.col("err.msg").alias("msg"),
    )


def display_log(repaired: DataFrame) -> DataFrame:
    """Display explosion with common/page_id/ts enrichment
    (RT/app/dwd/BaseLogApp.java:137-151)."""
    exploded = repaired.filter(
        F.col("start").isNull() & (F.size("displays") > 0)
    ).select(
        "common", "event_id", "ts", F.col("page.page_id").alias("page_id"),
        F.explode("displays").alias("d"),
    )
    return exploded.select(
        *[F.col(f"common.{c}").alias(c) for c in _COMMON],
        "event_id",
        "ts",
        "page_id",
        F.col("d.display_type").alias("display_type"),
        F.col("d.item").alias("item"),
        F.col("d.item_type").alias("item_type"),
        F.col("d.pos_id").alias("pos_id"),
    )


def action_log(repaired: DataFrame) -> DataFrame:
    """Action explosion with common/page_id enrichment
    (RT/app/dwd/BaseLogApp.java:153-162). The action's own ts replaces the
    event ts in the reference output; both kept here (action_ts)."""
    exploded = repaired.filter(
        F.col("start").isNull() & (F.size("actions") > 0)
    ).select(
        "common", "event_id", F.col("page.page_id").alias("page_id"),
        F.explode("actions").alias("a"),
    )
    return exploded.select(
        *[F.col(f"common.{c}").alias(c) for c in _COMMON],
        "event_id",
        "page_id",
        F.col("a.action_id").alias("action_id"),
        F.col("a.item").alias("item"),
        F.col("a.item_type").alias("item_type"),
        F.col("a.ts").alias("action_ts"),
    )


def unique_visitor_detail(page: DataFrame) -> DataFrame:
    """D1 first-visit-per-day dedup (RT/app/dwd/DwdTrafficUniqueVisitorDetail.java:53-105):
    session starts only (last_page_id IS NULL), keep the first event per
    (mid, day). Batch = row_number over (mid, date)."""
    starts = page.filter(F.col("last_page_id").isNull())
    w = Window.partitionBy("mid", _date(F.col("ts"))).orderBy("ts", "event_id")
    return (
        starts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def user_jump_detail(page: DataFrame) -> DataFrame:
    """D5 bounce detection (RT/app/dwd/DwdTrafficUserJumpDetail.java:73-119).

    CEP ``begin(last_page_id IS NULL).next(last_page_id IS NULL).within(10s)``
    keyed by mid, matched-first union timed-out-first. Batch equivalence via
    lead(): a session start bounces iff the mid's next page event is absent,
    later than 10 s, or itself a session start.
    """
    w = Window.partitionBy("mid").orderBy("ts", "event_id")
    with_next = page.withColumn("next_ts", F.lead("ts").over(w)).withColumn(
        "next_last_page", F.lead("last_page_id").over(w)
    )
    bounce = with_next.filter(
        F.col("last_page_id").isNull()
        & (
            F.col("next_ts").isNull()
            | (F.col("next_ts") - F.col("ts") > BOUNCE_WINDOW_MS)
            | F.col("next_last_page").isNull()
        )
    )
    return bounce.drop("next_ts", "next_last_page")
