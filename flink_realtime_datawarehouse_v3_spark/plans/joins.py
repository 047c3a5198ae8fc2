"""Join-shape parity operators (SURVEY.md §2.4 J7-J9).

The reference demonstrates these in its manual test harnesses; they are
part of the engine surface a user could rely on, so each is a first-class
catalog query:

- J7 interval join (TEST/Flink04_DataStreamJoinTest.java:55-66:
  ``intervalJoin ... between(-5s, +5s)``): equi-key join with a time-range
  predicate. Spark executes this as the stream-stream time-bound join in
  streaming; in batch it is an equi-join + range filter — the equi key
  keeps it a hash join (NOT a cartesian range join).
- J8 full outer join (TEST/Flink07_Upsert_kafkaTest.java:47-58: changelog
  into upsert-kafka): ``full_outer`` on the shared order_detail key.
- J9 right join (TEST/Flink05_SQL_JoinTest.java:45-60) — same machinery
  as left; exposed through the full-outer query's shape.

Scale: both shuffle on their equi keys (user_id / order_detail_id, high
cardinality); the interval predicate is evaluated post-join JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The reference demos +-5 s on a dense hand-fed socket stream; the driver's
# synthetic events are ~minutes apart per user, so the catalog query uses
# +-1 h to be non-vacuous. The operator shape (equi-key + time range) is
# what J7 specifies; the bound is a parameter.
INTERVAL_MS = 3_600_000


def interval_join_events(events: DataFrame) -> DataFrame:
    """J7: click events joined to view events of the same user within
    +-1 h (event-time interval join, batch form)."""
    base = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
    )
    a = base.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("click_event_id"),
        F.col("ts_ms").alias("click_ts"),
    )
    b = base.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("b_user_id"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts_ms").alias("view_ts"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.b_user_id)
            & (b.view_ts >= a.click_ts - INTERVAL_MS)
            & (b.view_ts <= a.click_ts + INTERVAL_MS),
            "inner",
        )
        .select(
            "user_id",
            "click_event_id",
            "view_event_id",
            (F.col("view_ts") - F.col("click_ts")).alias("delta_ms"),
        )
    )


def asof_join_events(events: DataFrame) -> DataFrame:
    """Backward as-of join: each click event matched to the LATEST view
    event of the same user at-or-before the click (ties on ts -> highest
    view event_id); clicks with no prior view keep a NULL view side.

    This is the temporal-join shape the reference's lookup joins
    approximate (J3, RT/app/dwd/DwdTradeOrderPreProcess.java FOR SYSTEM_TIME
    AS OF semantics) expressed for two event streams. Scale design: NOT a
    range join — both sides are union-tagged and sorted once per user key,
    and ``last(ignorenulls)`` over the running frame carries the most
    recent view forward. One shuffle on user_id, O(n log n) per key,
    no candidate-pair blowup regardless of time skew.
    """
    from pyspark.sql.window import Window

    base = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
    )
    views = base.filter(F.col("event_type") == "view").select(
        "user_id", "ts_ms", "event_id", F.lit(0).alias("is_click")
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        "user_id", "ts_ms", "event_id", F.lit(1).alias("is_click")
    )
    # Views sort BEFORE clicks at equal ts (is_click asc), so a same-ms view
    # is visible to the click; among equal-ts views the last in (ts_ms,
    # event_id) order is the max event_id — mirroring the oracle's
    # ORDER BY v.ts DESC, v.event_id DESC tie-break.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = views.unionByName(clicks).withColumn(
        "v",
        F.last(
            F.when(
                F.col("is_click") == 0, F.struct("ts_ms", "event_id")
            ),
            ignorenulls=True,
        ).over(w),
    )
    return carried.filter(F.col("is_click") == 1).select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("v.event_id").alias("view_event_id"),
        (F.col("ts_ms") - F.col("v.ts_ms")).alias("lag_ms"),
    )


def activity_coupon_full_outer(topic_db: DataFrame) -> DataFrame:
    """J8: order_detail_activity FULL OUTER order_detail_coupon on the
    order_detail key — the changelog row set an upsert-kafka sink would
    carry (nulls on either side where only one table has the detail)."""
    d = F.col("data")
    oa = topic_db.filter(F.col("table") == "order_detail_activity").select(
        d.getItem("order_detail_id").alias("a_detail_id"),
        d.getItem("activity_id").alias("activity_id"),
        d.getItem("activity_rule_id").alias("activity_rule_id"),
    )
    oc = topic_db.filter(F.col("table") == "order_detail_coupon").select(
        d.getItem("order_detail_id").alias("c_detail_id"),
        d.getItem("coupon_id").alias("coupon_id"),
        d.getItem("coupon_use_id").alias("coupon_use_id"),
    )
    return (
        oa.join(oc, oa.a_detail_id == oc.c_detail_id, "full_outer")
        .select(
            F.coalesce("a_detail_id", "c_detail_id").alias("order_detail_id"),
            "activity_id",
            "activity_rule_id",
            "coupon_id",
            "coupon_use_id",
        )
    )


def activity_coupon_right_outer(topic_db: DataFrame) -> DataFrame:
    """J9 right outer join (TEST/Flink05_SQL_JoinTest.java:45-60 documents
    the inner/left/right retention trio): every coupon detail row is kept,
    with NULL activity columns where no activity references the detail —
    the mirror of the left-retention shape used throughout the DWD joins.
    Same machinery (hash join on the order_detail key); the retained side
    merely flips."""
    d = F.col("data")
    oa = topic_db.filter(F.col("table") == "order_detail_activity").select(
        d.getItem("order_detail_id").alias("a_detail_id"),
        d.getItem("activity_id").alias("activity_id"),
        d.getItem("activity_rule_id").alias("activity_rule_id"),
    )
    oc = topic_db.filter(F.col("table") == "order_detail_coupon").select(
        d.getItem("order_detail_id").alias("c_detail_id"),
        d.getItem("coupon_id").alias("coupon_id"),
        d.getItem("coupon_use_id").alias("coupon_use_id"),
    )
    return oa.join(oc, oa.a_detail_id == oc.c_detail_id, "right_outer").select(
        F.col("c_detail_id").alias("order_detail_id"),
        "activity_id",
        "activity_rule_id",
        "coupon_id",
        "coupon_use_id",
    )


def view_no_purchase_users(events: DataFrame) -> DataFrame:
    """Left ANTI join (the funnel-drop query): users with at least one
    view event and NO purchase event, with their view counts.

    Semi/anti joins are absent from the reference (SURVEY.md §2.4 JN) but
    first-class in Catalyst; the anti side ships only the distinct
    purchase user ids through the shuffle — at 100 TB the build side is
    the deduplicated key set, not the purchase fact table, and AQE can
    broadcast it when small.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return views.join(purchasers, "user_id", "left_anti")


def viewers_and_buyers(events: DataFrame) -> DataFrame:
    """INTERSECT (set-op family, absent from the reference like §2.8's
    sort/limit): user ids present in BOTH the view and purchase event
    streams. Catalyst plans INTERSECT as a left-semi aggregate join over
    the deduplicated key sets — only distinct ids cross the shuffle."""
    views = events.filter(F.col("event_type") == "view").select("user_id")
    buys = events.filter(F.col("event_type") == "purchase").select("user_id")
    return views.intersect(buys)


def viewers_minus_buyers(events: DataFrame) -> DataFrame:
    """EXCEPT — the other half of the set-op family: distinct viewer ids
    with no purchase. Catalyst plans EXCEPT DISTINCT as a left-ANTI
    aggregate join over deduplicated keys (same shuffle shape as
    INTERSECT); semantically the set-op sibling of the
    view_no_purchase_users anti-join, minus the per-user counts."""
    views = events.filter(F.col("event_type") == "view").select("user_id")
    buys = events.filter(F.col("event_type") == "purchase").select("user_id")
    return views.subtract(buys)
