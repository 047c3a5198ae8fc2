"""Time-series rollup operators over the ``events`` stream table.

Beyond the reference surface (its windows are all 10 s tumbling — e.g.
RT/app/dws/DwsTradeOrderWindow.java:172): the two aggregate shapes a
warehouse user expects next are the hypertable-style *continuous
aggregate* (downsample a raw event stream into per-key time buckets,
keeping first/last/min/max/sum — the TimescaleDB/ClickHouse
materialized-rollup pattern) and *hopping (sliding) windows* (Flink's
``HOP``; Spark's ``window(ts, windowDuration, slideDuration)``).

Scale posture: both are single hash-aggregation passes — partial
aggregation map-side, one shuffle on (key, bucket). ``min_by/max_by``
keep first/last values inside the same agg (no window-function sort, no
self-join); the hop window fans each row into window/slide rows map-side
(2x here), which is the canonical Spark plan for sliding aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BUCKET_MS = 60_000  # 1-minute rollup buckets
HOP_WINDOW = "10 minutes"
HOP_SLIDE = "5 minutes"


def time_rollup(events: DataFrame, bucket_ms: int = BUCKET_MS) -> DataFrame:
    """Per (user_id, time bucket): event count, exact value sum, first/last
    value by event time, min/max value.

    first/last use ``min_by/max_by`` on the raw microsecond timestamp
    (unique per user in the fixture — verified no (user_id, ts)
    duplicates), so the whole rollup is ONE partial-aggregatable hash agg:
    the shape that turns 100 TB of raw events into a queryable downsample
    without a sort or self-join. The value sum accumulates in
    decimal(18,2) so the result is exact regardless of partition/merge
    order (float sums would drift between engines).
    """
    # FLOOR-division semantics, matching the oracle's `//`: Spark's DIV
    # truncates toward zero, which diverges on pre-epoch (negative
    # epoch-ms) timestamps. floor(x/b)*b with exact integer re-multiply;
    # the double quotient is exact for |x| < 2^53 (epoch-ms until year
    # ~287396), so no boundary off-by-one.
    bucket = F.expr(
        f"CAST(floor(unix_millis(ts) / {bucket_ms}) AS BIGINT) * {bucket_ms}"
    )
    return (
        events.select("user_id", bucket.alias("bucket_ms"), "ts", "value")
        .groupBy("user_id", "bucket_ms")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
            F.min_by("value", "ts").alias("first_value"),
            F.max_by("value", "ts").alias("last_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def hop_window_counts(events: DataFrame) -> DataFrame:
    """Per (event_type, hopping 10-min window sliding by 5 min): count and
    exact value sum. Spark's ``window()`` with a slide emits each row into
    window/slide = 2 panes map-side and hash-aggregates — no
    window-function sort. Window starts align to the epoch in multiples of
    the slide (Spark's documented alignment), which the oracle reproduces
    arithmetically."""
    return (
        events.groupBy(
            F.window("ts", HOP_WINDOW, HOP_SLIDE).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            "event_type",
            F.unix_millis(F.col("w.start")).alias("ws_ms"),
            "n_events",
            "value_sum",
        )
    )


def value_twap(events: DataFrame) -> DataFrame:
    """Time-weighted average per (user, day) over IRREGULAR samples —
    the TimescaleDB ``time_weight`` (LOCF) shape: each observation holds
    until the next one, so the day's average integrates the step
    function over the observed span instead of averaging points (a
    sensor that reports rarely at a steady value should not be drowned
    out by a burst of identical readings — the bias a plain AVG has on
    irregular series, and the semantic the count-weighted trailing
    window cannot express).

    Exact integers end to end: integral = sum(v_micro * dt_sec) via a
    lead() frame ordered by (ts, event_id) (zero-length segments from
    duplicate timestamps contribute 0), divided by the observed span
    with truncating DIV. Single-point days carry no span and are
    dropped (span_s > 0). One shuffle on (user, day) + one in-partition
    sort — lead and the aggregation share it."""
    from pyspark.sql import Window

    base = events.select(
        "user_id",
        F.to_date("ts").alias("dt"),
        F.expr("unix_millis(ts) DIV 1000").alias("ts_s"),
        F.round(F.col("value") * 1e6).cast("bigint").alias("v_micro"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "dt").orderBy("ts_s", "event_id")
    seg = base.withColumn(
        "dt_next", F.lead("ts_s").over(w)
    ).withColumn(
        "seg_micro_s",
        F.when(
            F.col("dt_next").isNotNull(),
            F.col("v_micro") * (F.col("dt_next") - F.col("ts_s")),
        ).otherwise(F.lit(0)),
    )
    return (
        seg.groupBy("user_id", "dt")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            (F.max("ts_s") - F.min("ts_s")).cast("bigint").alias("span_s"),
            F.sum("seg_micro_s").cast("bigint").alias("integral_micro_s"),
        )
        .filter(F.col("span_s") > 0)
        .select(
            "user_id",
            F.date_format("dt", "yyyy-MM-dd").alias("dt"),
            "n_points",
            "span_s",
            "integral_micro_s",
            F.expr("integral_micro_s DIV span_s").alias("twap_micro"),
        )
    )


TRAIL_WINDOW_SEC = 3600


def value_trailing_window(
    events: DataFrame, window_sec: int = TRAIL_WINDOW_SEC
) -> DataFrame:
    """Per-event trailing TIME-RANGE aggregate: for every event, the
    count / sum / mean of the user's values in the preceding
    ``window_sec`` seconds INCLUSIVE — the RANGE-frame analytic window
    (frame bounded by ORDER-BY VALUE distance, not row offsets) that
    none of the ROWS-frame entries exercise. Peers (equal timestamps)
    enter the frame together in every engine by RANGE semantics, so the
    result is row-order independent.

    Exact integers end to end: second-granularity epoch via integer DIV,
    micro-unit values, truncating integer division for the mean.

    Scale: one shuffle on user_id + one in-partition sort; the engine
    computes the frame in a single forward pass holding only the events
    inside the trailing window (memory bounded by the densest
    window_sec span, never the partition)."""
    from pyspark.sql import Window

    base = events.select(
        "user_id",
        "event_id",
        F.expr("unix_millis(ts) DIV 1000").alias("ts_s"),
        F.round(F.col("value") * 1e6).cast("bigint").alias("v_micro"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-window_sec, 0)
    )
    return base.select(
        "user_id",
        "event_id",
        "ts_s",
        "v_micro",
        F.count(F.lit(1)).over(w).cast("bigint").alias("trail_n"),
        F.sum("v_micro").over(w).cast("bigint").alias("trail_sum_micro"),
    ).withColumn(  # exact integer division (truncating on both engines)
        "trail_avg_micro", F.expr("trail_sum_micro DIV trail_n")
    )


def running_total(events: DataFrame) -> DataFrame:
    """Per-user running value total ordered by event time (an explicit
    ROWS UNBOUNDED PRECEDING frame — the analytic-window shape the
    reference never uses, SURVEY.md §2.7). Accumulates in decimal(18,2)
    so every prefix sum is exact regardless of engine or merge order.

    Scale: one shuffle on user_id + one in-partition sort; the frame is
    computed in a single forward pass per key (no per-row re-aggregation).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


def gap_fill_locf(events: DataFrame, bucket_ms: int = BUCKET_MS) -> DataFrame:
    """Gap filling with last-observation-carried-forward — the hypertable
    ``time_bucket_gapfill`` + ``locf`` pattern: a dense per-(event_type,
    minute) spine with empty buckets materialized (n_events = 0) and the
    last observed mean value carried forward.

    Scale shape: bucketed observations are one hash agg; the dense spine
    is |types| x |minutes| rows generated from a per-type bounds agg
    (never from the raw events — generate_series over the bounded bucket
    range); the LOCF is one window pass PARTITIONED by event_type, so
    each series sorts only its own spine. The carried value is the
    6-decimal rounded per-bucket mean (decimal-exact sum / count), so
    both engines carry identical doubles."""
    # floor(), not a truncating cast: Spark's cast/DIV truncate toward
    # zero and diverge from the oracle's // on pre-epoch (negative
    # epoch-ms) timestamps — same guard as time_rollup above.
    b = (
        F.floor(F.unix_millis(F.col("ts")) / F.lit(bucket_ms)).cast("bigint")
        * bucket_ms
    )
    obs = (
        events.select("event_type", b.alias("bucket_ms"),
                      F.col("value").cast("decimal(18,2)").alias("v"))
        .groupBy("event_type", "bucket_ms")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round((F.sum("v") / F.count(F.lit(1))).cast("double"), 6)
            .alias("mean_value"),
        )
    )
    bounds = obs.groupBy("event_type").agg(
        F.min("bucket_ms").alias("lo"), F.max("bucket_ms").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(bucket_ms))
        ).alias("bucket_ms"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = spine.join(obs, ["event_type", "bucket_ms"], "left")
    return joined.select(
        "event_type",
        "bucket_ms",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("mean_value", ignorenulls=True).over(w).alias("locf_value"),
        (F.col("n_events").isNull()).cast("int").alias("is_gap"),
    )
