"""Gap-based sessionization (the session-window counterpart of the
tumbling windows in plans/dws.py).

The reference's windows are all tumbling (FlinkSQL TUMBLE, e.g.
RT/app/dws/DwsTradeOrderWindow.java:60-75); session windows are the other
first-class Flink window type (``window(EventTimeSessionWindows.withGap)``)
and a streaming warehouse user expects both. Spark-first shape: the
built-in ``F.session_window`` aggregation — Catalyst's native
gap-merge operator (one shuffle on the session key, windows merged
map-side per key, no window-id materialization) — NOT a lag/cumsum
window-function re-derivation, which would sort twice.

Semantics (both engines): a session is a maximal run of a user's events
where consecutive gaps are <= GAP; session_end = last event ts + GAP.
Events exactly GAP apart DO merge (Spark closes a session only when the
next event is strictly past last+gap — verified empirically; the oracle's
new-session predicate is ``gap > GAP``, not ``>=``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAP = "30 minutes"
GAP_MS = 30 * 60 * 1000


def shape_events(events: DataFrame) -> DataFrame:
    """(user_id, ts, value) with ts truncated to ms — the sub-ms digits
    carry float/precision drift across engines; the session structure at
    ms resolution is identical. Shared by the batch and streaming forms
    (the streaming form inserts its watermark between this and the agg)."""
    return events.select(
        "user_id",
        F.timestamp_millis(F.unix_millis(F.col("ts"))).alias("ts"),
        "value",
    )


def session_agg(e: DataFrame) -> DataFrame:
    """The gap-merge aggregation over a :func:`shape_events`-shaped input
    (batch or streaming-with-watermark)."""
    agg = (
        e.groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # Decimal accumulation: exact regardless of partition/merge
            # order (float sums would drift between engines).
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
    )
    return agg.select(
        "user_id",
        F.unix_millis(F.col("w.start")).alias("session_start_ms"),
        F.unix_millis(F.col("w.end")).alias("session_end_ms"),
        "n_events",
        "value_sum",
    )


def session_stats(events: DataFrame) -> DataFrame:
    """Per (user, session): bounds, event count, value sum."""
    return session_agg(shape_events(events))


def session_funnel(events: DataFrame) -> DataFrame:
    """Per-session funnel: view / click / purchase counts and a converted
    flag (>=1 view AND >=1 purchase inside one session) — the conversion
    analysis a sessionized event warehouse exists to answer.

    Same single gap-merge aggregation as :func:`session_stats` (one
    shuffle on user_id, windows merged map-side); the funnel metrics are
    conditional counts inside that agg, so the funnel costs nothing over
    the plain session rollup.
    """
    e = events.select(
        "user_id",
        F.timestamp_millis(F.unix_millis(F.col("ts"))).alias("ts"),
        "event_type",
    )
    n_of = lambda t: F.count(F.when(F.col("event_type") == t, 1))  # noqa: E731
    agg = (
        e.groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_of("view").alias("n_views"),
            n_of("click").alias("n_clicks"),
            n_of("purchase").alias("n_purchases"),
        )
    )
    return agg.select(
        "user_id",
        F.unix_millis(F.col("w.start")).alias("session_start_ms"),
        "n_events",
        "n_views",
        "n_clicks",
        "n_purchases",
        ((F.col("n_views") > 0) & (F.col("n_purchases") > 0))
        .cast("int")
        .alias("converted"),
    )
