"""Join-shape parity registrations (J7/J8) + analytics windows.

Split out of the monolithic api.py in round 12 — REGISTRATION ORDER
is preserved by the import order in registry/__init__.py; the
order-drift and driver-window gates (tests/test_driver_order.py)
verify it.
"""

from __future__ import annotations

from ._core import DataFrame, SparkSession, register  # noqa: F401

# --- join-shape parity (J7/J8) -----------------------------------------------

from ..plans import joins as joins_plan  # noqa: E402
from ..sources import tables as tables_mod  # noqa: E402

register(
    "interval_join_events",
    lambda spark, sf: joins_plan.interval_join_events(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT a.user_id,
              a.event_id AS click_event_id,
              b.event_id AS view_event_id,
              epoch_ms(b.ts) - epoch_ms(a.ts) AS delta_ms
       FROM events a JOIN events b
         ON a.user_id = b.user_id
        AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR
       WHERE a.event_type = 'click' AND b.event_type = 'view'""",
)

# Backward as-of join (temporal-join shape): latest prior view per click.
# Oracle controls the tie-break explicitly (greatest ms, then greatest
# event_id) instead of DuckDB's ASOF JOIN, whose equal-key choice is
# unspecified; ms-truncated epochs on both sides.
register(
    "asof_join_events",
    lambda spark, sf: joins_plan.asof_join_events(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT user_id, click_event_id, view_event_id, lag_ms FROM (
           SELECT c.user_id, c.event_id AS click_event_id,
                  v.event_id AS view_event_id,
                  epoch_ms(c.ts) - epoch_ms(v.ts) AS lag_ms,
                  row_number() OVER (
                      PARTITION BY c.event_id
                      ORDER BY epoch_ms(v.ts) DESC, v.event_id DESC) AS rn
           FROM (SELECT * FROM events WHERE event_type = 'click') c
           LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
             ON c.user_id = v.user_id AND epoch_ms(v.ts) <= epoch_ms(c.ts))
       WHERE rn = 1""",
)

from ..operators import sessionize as sessionize_op  # noqa: E402

# Gap-based session windows (Spark's native session_window operator); the
# oracle re-derives the same sessions via the lag/cumsum formulation.
register(
    "sessionize_events",
    lambda spark, sf: sessionize_op.session_stats(
        tables_mod.load(spark, sf, "events")
    ),
    f"""WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, value, event_id
                   FROM events),
        d AS (SELECT *, CASE WHEN lag(tms) OVER w IS NULL
                             OR tms - lag(tms) OVER w > {sessionize_op.GAP_MS}
                             THEN 1 ELSE 0 END AS ns
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
        s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tms, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM d)
    SELECT user_id, min(tms) AS session_start_ms,
           max(tms) + {sessionize_op.GAP_MS} AS session_end_ms,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM s GROUP BY user_id, sid""",
)

from ..operators import timeseries as timeseries_op  # noqa: E402

# Hypertable-style continuous aggregate: downsample raw events into
# per-(user, 1-min bucket) rollups with first/last via min_by/max_by —
# ONE partial-aggregatable hash agg, no sort, no self-join.
register(
    "events_time_rollup",
    lambda spark, sf: timeseries_op.time_rollup(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT user_id, (epoch_ms(ts) // 60000) * 60000 AS bucket_ms,
              count(*) AS n_events,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
              arg_min(value, ts) AS first_value,
              arg_max(value, ts) AS last_value,
              min(value) AS min_value, max(value) AS max_value
       FROM events GROUP BY 1, 2""",
)

# Hopping (sliding) windows — the Flink HOP shape the reference never
# uses (its windows are all 10 s tumbling); Spark's window(w, slide)
# emits window/slide = 2 panes per row map-side. Window starts align to
# the epoch in multiples of the slide, reproduced arithmetically in the
# oracle (every row lands in exactly the panes i = 0, 1 when w = 2*slide).
register(
    "events_hop_window",
    lambda spark, sf: timeseries_op.hop_window_counts(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT event_type,
              (epoch_ms(ts) // 300000 - g.i) * 300000 AS ws_ms,
              count(*) AS n_events,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       FROM events CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS i) g
       GROUP BY 1, 2""",
)

from ..operators import profiling as profiling_op  # noqa: E402

# Column profiling: per-type distribution stats with EXACT sort-based
# percentiles (Spark `percentile` == DuckDB `quantile_cont`, verified) and
# decimal-power-sum mean/stddev so no float drift can occur. The
# percentile_approx (t-digest) twin is the declared 100 TB drop-in.
register(
    "events_profile_stats",
    lambda spark, sf: profiling_op.profile_stats(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT event_type, count(*) AS n_events,
              round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*), 6) AS mean_value,
              round(sqrt((CAST(sum(CAST(value AS DECIMAL(18,2))
                                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                          - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                            * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                            / count(*))
                         / (count(*) - 1)), 6) AS stddev_value,
              min(value) AS min_value, max(value) AS max_value,
              round(quantile_cont(value, 0.5), 6) AS p50,
              round(quantile_cont(value, 0.9), 6) AS p90,
              round(quantile_cont(value, 0.99), 6) AS p99
       FROM events GROUP BY event_type""",
)

# Fixed-width value histogram per type: the distribution's shape next to
# profile_stats' quantiles; exact integer bin counts, one hash agg.
register(
    "events_value_histogram",
    lambda spark, sf: profiling_op.value_histogram(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT event_type,
              CAST(floor(value / 25.0) AS BIGINT) * 25 AS bin_lo,
              count(*) AS n_events
       FROM events GROUP BY 1, 2""",
)

# The 100 TB drop-in: t-digest percentile_approx instead of the exact
# sort-based percentile — declared approximation, rows-only in the driver
# contract; the tolerance gate lives in tests/test_training_ops.py.
register(
    "events_profile_stats_approx",
    lambda spark, sf: profiling_op.profile_stats(
        tables_mod.load(spark, sf, "events"), approx=True
    ),
)

# Left ANTI join (funnel drop): viewers who never purchased. Semi/anti
# joins are absent from the reference surface (SURVEY.md §2.4 JN) but a
# warehouse user expects them; the anti build side is the distinct
# purchaser id set, not the purchase fact table.
register(
    "events_view_no_purchase",
    lambda spark, sf: joins_plan.view_no_purchase_users(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT user_id, count(*) AS n_views
       FROM events v WHERE event_type = 'view'
         AND NOT EXISTS (SELECT 1 FROM events p
                         WHERE p.event_type = 'purchase'
                           AND p.user_id = v.user_id)
       GROUP BY user_id""",
)

# Analytic window frame: per-user running total, ROWS UNBOUNDED
# PRECEDING with exact decimal prefix sums.
register(
    "events_running_total",
    lambda spark, sf: timeseries_op.running_total(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
              CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
       FROM events""",
)

# Time-weighted average per (user, day) over irregular samples — the
# LOCF integral (duration-weighted, not count-weighted): sum(v * dt)
# via lead(), DIV the observed span; single-point days dropped.
register(
    "events_value_twap",
    lambda spark, sf: timeseries_op.value_twap(
        tables_mod.load(spark, sf, "events")
    ),
    """WITH seg AS (
  SELECT user_id, CAST(ts AS DATE) AS d, epoch_ms(ts) // 1000 AS ts_s,
         CAST(round(value * 1e6) AS BIGINT) AS v_micro,
         lead(epoch_ms(ts) // 1000) OVER (
             PARTITION BY user_id, CAST(ts AS DATE)
             ORDER BY epoch_ms(ts) // 1000, event_id) AS next_s
  FROM events)
SELECT user_id, strftime(d, '%Y-%m-%d') AS dt,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(max(ts_s) - min(ts_s) AS BIGINT) AS span_s,
       CAST(sum(CASE WHEN next_s IS NOT NULL
                     THEN v_micro * (next_s - ts_s) ELSE 0 END)
            AS BIGINT) AS integral_micro_s,
       CAST(sum(CASE WHEN next_s IS NOT NULL
                     THEN v_micro * (next_s - ts_s) ELSE 0 END)
            // (max(ts_s) - min(ts_s)) AS BIGINT) AS twap_micro
FROM seg GROUP BY user_id, d
HAVING max(ts_s) - min(ts_s) > 0""",
)

# Trailing TIME-RANGE window (RANGE frame — bounded by ORDER-BY value
# distance, not row offsets): per event, the user's count/sum/mean over
# the preceding hour inclusive. Peers enter the frame together by RANGE
# semantics, so the result is row-order independent across engines.
register(
    "events_value_trailing_window",
    lambda spark, sf: timeseries_op.value_trailing_window(
        tables_mod.load(spark, sf, "events")
    ),
    f"""SELECT user_id, event_id, ts_s, v_micro,
       CAST(count(*) OVER w AS BIGINT) AS trail_n,
       CAST(sum(v_micro) OVER w AS BIGINT) AS trail_sum_micro,
       CAST(sum(v_micro) OVER w // count(*) OVER w AS BIGINT)
         AS trail_avg_micro
FROM (SELECT user_id, event_id, epoch_ms(ts) // 1000 AS ts_s,
             CAST(round(value * 1e6) AS BIGINT) AS v_micro
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN {timeseries_op.TRAIL_WINDOW_SEC} PRECEDING
                       AND CURRENT ROW)""",
)

from ..operators import analytics as analytics_op  # noqa: E402

# Per-group top-N: rank window + filter, rewritten by Catalyst into
# WindowGroupLimit (per-partition per-group heaps before the sort).
register(
    "events_topn_per_group",
    lambda spark, sf: analytics_op.topn_per_group(
        tables_mod.load(spark, sf, "events")
    ),
    f"""SELECT event_type, rn, event_id, user_id, value
        FROM (SELECT event_type, event_id, user_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id) AS rn
              FROM events)
        WHERE rn <= {analytics_op.TOPN}""",
)

# Cohort retention matrix: first-seen date per user -> distinct active
# users per (cohort, day offset).
register(
    "events_retention_cohort",
    lambda spark, sf: analytics_op.retention_cohort(
        tables_mod.load(spark, sf, "events")
    ),
    f"""WITH dts AS (SELECT user_id, CAST(ts AS DATE) AS dt FROM events),
cohort AS (SELECT user_id, min(dt) AS cohort_dt FROM dts GROUP BY user_id)
SELECT strftime(c.cohort_dt, '%Y-%m-%d') AS cohort_dt,
       CAST(datediff('day', c.cohort_dt, d.dt) AS INT) AS day_offset,
       count(DISTINCT d.user_id) AS n_active
FROM dts d JOIN cohort c USING (user_id)
WHERE datediff('day', c.cohort_dt, d.dt) <= {analytics_op.RETENTION_MAX_DAYS}
GROUP BY 1, 2""",
)

# Full CUBE lattice over (event_type, date) with GROUPING bits.
register(
    "events_type_day_cube",
    lambda spark, sf: analytics_op.type_day_cube(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
              GROUPING(event_type, CAST(ts AS DATE)) AS level,
              count(*) AS n_events,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       FROM events GROUP BY CUBE(event_type, CAST(ts AS DATE))""",
)

# Custom GROUPING SETS {(type, dt), (dt), (type)} — the asymmetric
# lattice neither ROLLUP nor CUBE expresses (both marginals, no grand
# total); same one-pass Expand execution as the cube entry.
register(
    "events_type_day_grouping_sets",
    lambda spark, sf: analytics_op.type_day_grouping_sets(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
              GROUPING(event_type, CAST(ts AS DATE)) AS level,
              count(*) AS n_events,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       FROM events
       GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)),
                               (CAST(ts AS DATE)), (event_type))""",
)

# Lag-frame inter-event gaps per user; exact integer microsecond sums.
register(
    "events_user_gap_stats",
    lambda spark, sf: analytics_op.user_gap_stats(
        tables_mod.load(spark, sf, "events")
    ),
    """WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events)
SELECT user_id, count(*) + 1 AS n_events, max(gap_us) AS max_gap_us,
       CAST(sum(gap_us) AS BIGINT) / count(*) AS mean_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY user_id""",
)

# JSON property extraction (Catalyst get_json_object) + per-type stats.
register(
    "events_props_k_stats",
    lambda spark, sf: analytics_op.props_k_stats(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT event_type, count(*) AS n_events,
              CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max
       FROM (SELECT event_type,
                    CAST(json_extract_string(props, '$.k') AS INT) AS k
             FROM events)
       WHERE k IS NOT NULL GROUP BY event_type""",
)

# Z-score anomaly flags per event_type: moments from exact decimal sums
# (order-independent), broadcast back as a filter; both engines filter on
# the 6-decimal-rounded score so the boundary is identical.
register(
    "events_value_anomalies",
    lambda spark, sf: analytics_op.value_anomalies(
        tables_mod.load(spark, sf, "events")
    ),
    f"""WITH s AS (
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,8)) AS s1,
           sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
                    AS DECIMAL(38,8))) AS s2
    FROM events GROUP BY 1),
st AS (SELECT * FROM (
         SELECT event_type, CAST(s1 AS DOUBLE) / n AS mean,
                sqrt((CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n) AS sd
         FROM s) WHERE sd > 0)
SELECT e.event_id, e.event_type, e.value,
       round((e.value - st.mean) / st.sd, 6) AS zscore
FROM events e JOIN st USING (event_type)
WHERE abs(round((e.value - st.mean) / st.sd, 6)) > {analytics_op.ZSCORE_THRESHOLD}""",
)

# Exact-moment Pearson correlation (value vs props.k) per event_type.
register(
    "events_value_k_corr",
    lambda spark, sf: analytics_op.value_k_correlation(
        tables_mod.load(spark, sf, "events")
    ),
    """WITH b AS (
    SELECT event_type, CAST(value AS DECIMAL(18,2)) AS x,
           CAST(CAST(json_extract_string(props, '$.k') AS INT)
                AS DECIMAL(18,2)) AS y
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL),
m AS (
    SELECT event_type, count(*) AS n,
           CAST(sum(x) AS DECIMAL(38,8)) AS sx,
           CAST(sum(y) AS DECIMAL(38,8)) AS sy,
           sum(CAST(x * x AS DECIMAL(38,8))) AS sxx,
           sum(CAST(y * y AS DECIMAL(38,8))) AS syy,
           sum(CAST(x * y AS DECIMAL(38,8))) AS sxy
    FROM b GROUP BY 1)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           AS pearson_r
FROM m
WHERE (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
  AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0""",
)

# Sort/limit over an aggregate (top event types); the streaming twin runs
# it as the COMPLETE-mode sorted snapshot.
register(
    "events_type_counts_top",
    lambda spark, sf: analytics_op.type_counts_top(
        tables_mod.load(spark, sf, "events")
    ),
    f"""SELECT event_type, count(*) AS n_events
        FROM events GROUP BY event_type
        ORDER BY n_events DESC, event_type
        LIMIT {analytics_op.TYPE_TOP_K}""",
)

# Count-min-sketch heavy hitters (r11): hot-key detection — the skew
# diagnosis a 100 TB shuffle plan runs before salting. The universal
# hash family is pure int64 arithmetic both engines evaluate
# bit-identically, so the ORACLE REBUILDS THE SKETCH (same counters,
# same collisions) and the hash gate verifies the sketch arithmetic
# itself — est_cnt AND true_cnt, not a tolerance band.
_CMS_VALUES = ", ".join(
    f"({i}, {a}, {b})"
    for i, (a, b) in enumerate(analytics_op.CMS_HASHES)
)
register(
    "events_heavy_hitters_cms",
    lambda spark, sf: analytics_op.heavy_hitters_cms(
        tables_mod.load(spark, sf, "events")
    ),
    f"""WITH counts AS (
            SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        hashes(row_i, a, b) AS (VALUES {_CMS_VALUES}),
        slots AS (
            SELECT user_id, c, row_i,
                   ((user_id % {analytics_op.CMS_P}) * a + b)
                       % {analytics_op.CMS_P} % {analytics_op.CMS_W}
                       AS bucket
            FROM counts CROSS JOIN hashes),
        counters AS (
            SELECT row_i, bucket, CAST(sum(c) AS BIGINT) AS counter
            FROM slots GROUP BY row_i, bucket)
     SELECT user_id, min(counter) AS est_cnt, min(c) AS true_cnt
     FROM slots JOIN counters USING (row_i, bucket)
     GROUP BY user_id
     ORDER BY est_cnt DESC, user_id
     LIMIT {analytics_op.CMS_TOP_K}""",
)

# RFM segmentation: ntile quartiles (the remaining window-function
# family member) over exact per-user purchase aggregates.
register(
    "events_user_rfm",
    lambda spark, sf: analytics_op.user_rfm(
        tables_mod.load(spark, sf, "events")
    ),
    f"""WITH per_user AS (
    SELECT user_id,
           CAST(epoch_us(max(ts)) AS BIGINT) AS last_purchase_us,
           count(*) AS frequency,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
    FROM events WHERE event_type = 'purchase' GROUP BY user_id)
SELECT user_id, last_purchase_us, frequency, monetary,
       ntile({analytics_op.RFM_BUCKETS}) OVER (
           ORDER BY last_purchase_us DESC, user_id) AS r_quartile,
       ntile({analytics_op.RFM_BUCKETS}) OVER (
           ORDER BY frequency DESC, user_id) AS f_quartile,
       ntile({analytics_op.RFM_BUCKETS}) OVER (
           ORDER BY monetary DESC, user_id) AS m_quartile
FROM per_user""",
)

# INTERSECT set op: ids in both the view and purchase streams.
register(
    "events_viewers_and_buyers",
    lambda spark, sf: joins_plan.viewers_and_buyers(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT user_id FROM events WHERE event_type = 'view'
       INTERSECT
       SELECT user_id FROM events WHERE event_type = 'purchase'""",
)

# EXCEPT set op: distinct viewer ids with no purchase (the set-op sibling
# of the anti-join funnel query).
register(
    "events_viewers_minus_buyers",
    lambda spark, sf: joins_plan.viewers_minus_buyers(
        tables_mod.load(spark, sf, "events")
    ),
    """SELECT user_id FROM events WHERE event_type = 'view'
       EXCEPT
       SELECT user_id FROM events WHERE event_type = 'purchase'""",
)

# Per-session funnel: conditional counts inside the same gap-merge agg
# as sessionize_events — conversion analysis at zero extra shuffle cost.
register(
    "session_funnel",
    lambda spark, sf: sessionize_op.session_funnel(
        tables_mod.load(spark, sf, "events")
    ),
    f"""WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, event_type, event_id
                   FROM events),
        d AS (SELECT *, CASE WHEN lag(tms) OVER w IS NULL
                             OR tms - lag(tms) OVER w > {sessionize_op.GAP_MS}
                             THEN 1 ELSE 0 END AS ns
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
        s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tms, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM d)
    SELECT user_id, min(tms) AS session_start_ms,
           count(*) AS n_events,
           CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_views,
           CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_clicks,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchases,
           CAST(count(CASE WHEN event_type = 'view' THEN 1 END) > 0
                AND count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
                AS INT) AS converted
    FROM s GROUP BY user_id, sid""",
)

from ..operators import skew as skew_op  # noqa: E402


def _salted_brand_revenue(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    l = tables_mod.load(spark, sf, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    p = tables_mod.load(spark, sf, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    j = skew_op.salted_join(l, p, on="partkey", dist_col="l_orderkey", buckets=8)
    return j.groupBy("p_brand").agg(
        F.count("*").alias("line_ct"),
        F.sum("price").cast("double").alias("revenue"),
    )


# The skew DIAGNOSTIC that motivates the salted join below: top join keys
# with counts and table share.
def _heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    l = tables_mod.load(spark, sf, "lineitem").select(
        F.col("l_partkey").alias("partkey")
    )
    return skew_op.heavy_hitters(l, "partkey")


register(
    "skew_heavy_hitters",
    _heavy_hitters,
    """SELECT l_partkey AS partkey, count(*) AS key_count,
              round(count(*) / (SELECT count(*) FROM lineitem), 6) AS share
       FROM lineitem GROUP BY 1
       ORDER BY key_count DESC, partkey LIMIT 20""",
)

register(
    "join_salted_skew",
    _salted_brand_revenue,
    """SELECT p_brand, count(*) AS line_ct,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand""",
)

from ..plans import olap as olap_plan  # noqa: E402

# Classic OLAP shapes on the TPC-H-ish tables (plans/olap.py): the
# scale-canonical scan/agg, fact-fact join + top-k, and star join. Money
# terms are integer CENTS (round before sum) so the hash crosses engines.
register(
    "tpch_q1_pricing_summary",
    olap_plan.pricing_summary,
    f"""SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_base_cents,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                     AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       CAST(sum(CAST(round(((l_extendedprice * (1 - l_discount))
                            * (1 + l_tax)) * 100) AS BIGINT)) AS BIGINT)
         AS sum_charge_cents,
       CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) * 1000000
            // count(*) AS BIGINT) AS avg_qty_micro,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) // count(*)
            AS BIGINT) AS avg_price_cents,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '{olap_plan.Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus""",
)

register(
    "tpch_q3_shipping_priority",
    olap_plan.shipping_priority,
    f"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '{olap_plan.Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{olap_plan.Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""",
)

register(
    "tpch_q5_local_supplier_volume",
    olap_plan.local_supplier_volume,
    """SELECT r_name, n_name,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name""",
)

# TPC-H Q18 shape (large-volume customers): pre-aggregate lineitem to
# per-order quantity, HAVING-filter to the heavy tail, join back to
# orders, top-20 by price — the agg-then-join pattern that keeps the
# join input at |orders| rows instead of |lineitem|.
register(
    "tpch_q18_large_orders",
    olap_plan.large_orders,
    f"""SELECT o_orderkey, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       sum_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
             AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > {olap_plan.Q18_MIN_QTY})
  ON l_orderkey = o_orderkey
ORDER BY total_cents DESC, o_orderkey LIMIT 20""",
)

# TPC-H Q4 shape: EXISTS -> LEFT SEMI join (equi key + lateness
# predicate as the join condition); the probe side never duplicates
# orders however many lineitems match.
register(
    "tpch_q4_order_priority",
    olap_plan.order_priority_check,
    f"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{olap_plan.Q4_START}'
  AND o_orderdate < TIMESTAMP '{olap_plan.Q4_END}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
                    + INTERVAL {olap_plan.Q4_LATE_DAYS} DAY)
GROUP BY o_orderpriority""",
)

# TPC-H Q17 shape: correlated scalar subquery (per-part avg quantity)
# decorrelated to agg-then-BROADCAST-join — the oracle keeps the
# correlated form so the driver proves the decorrelation is exact.
# Threshold in exact integers (5*qty*cnt < sum), never float division.
register(
    "tpch_q17_small_qty_revenue",
    olap_plan.small_quantity_revenue,
    f"""SELECT CAST(sum(rc) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_small_lineitems,
       CAST(sum(rc) // 7 AS BIGINT) AS avg_yearly_cents
FROM (SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT) AS rc
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = '{olap_plan.Q17_BRAND}'
        AND p.p_type = '{olap_plan.Q17_TYPE}'
        AND CAST(l.l_quantity AS BIGINT) * 5 *
            (SELECT count(*) FROM lineitem l2
             WHERE l2.l_partkey = p.p_partkey)
          < (SELECT sum(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
             WHERE l2.l_partkey = p.p_partkey)) t""",
)

# TPC-H Q20 shape: nested semi chain with a groupwise threshold —
# dominant suppliers (shipped > half a part's 1996 volume) left-semi
# into supplier. The oracle states the threshold as a window over the
# same pair agg; the plan side is one lineitem shuffle + a broadcast of
# the |parts|-row totals + a LEFT SEMI probe.
register(
    "tpch_q20_dominant_suppliers",
    olap_plan.dominant_part_suppliers,
    f"""WITH pq AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS pair_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{olap_plan.Q20_NAME_PREFIX}%'
    AND l_shipdate >= TIMESTAMP '{olap_plan.Q20_YEAR_START}'
    AND l_shipdate < TIMESTAMP '{olap_plan.Q20_YEAR_END}'
  GROUP BY l_partkey, l_suppkey),
dom AS (
  SELECT l_suppkey FROM (
    SELECT l_suppkey, pair_qty,
           sum(pair_qty) OVER (PARTITION BY l_partkey) AS part_total
    FROM pq) w
  WHERE pair_qty * 2 > part_total)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM dom)""",
)

# TPC-H Q22 shape: uncorrelated scalar subquery (global avg positive
# balance, a 1-row broadcast) + NOT EXISTS -> LEFT ANTI join. Exact
# integers: acctbal*n_pos > sum_pos instead of a float average.
register(
    "tpch_q22_idle_rich_customers",
    olap_plan.idle_rich_customers,
    """WITH c AS (SELECT c_custkey, c_nationkey,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
            FROM customer)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(acctbal_cents) AS BIGINT) AS total_cents
FROM c
WHERE acctbal_cents * (SELECT count(*) FROM c WHERE acctbal_cents > 0)
      > (SELECT sum(acctbal_cents) FROM c WHERE acctbal_cents > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
GROUP BY c_nationkey""",
)

# TPC-H Q6 shape: pure scan-filter-agg — every predicate must reach the
# parquet footer (plan-gated below).
register(
    "tpch_q6_forecast_revenue",
    olap_plan.forecast_revenue_change,
    f"""SELECT
  CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
       AS BIGINT) AS revenue_cents,
  CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{olap_plan.Q6_START}'
  AND l_shipdate < TIMESTAMP '{olap_plan.Q6_END}'
  AND l_discount BETWEEN {olap_plan.Q6_DISC_LO} AND {olap_plan.Q6_DISC_HI}
  AND l_quantity < {olap_plan.Q6_MAX_QTY}""",
)

# TPC-H Q7 shape: two-role nation broadcast + disjunctive nation-pair
# predicate over the Q5-style star.
register(
    "tpch_q7_volume_shipping",
    olap_plan.volume_shipping,
    f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{olap_plan.Q7_START}'
  AND l_shipdate < TIMESTAMP '{olap_plan.Q7_END}'
  AND ((n1.n_name = '{olap_plan.Q7_NATION_A}'
        AND n2.n_name = '{olap_plan.Q7_NATION_B}')
    OR (n1.n_name = '{olap_plan.Q7_NATION_B}'
        AND n2.n_name = '{olap_plan.Q7_NATION_A}'))
GROUP BY 1, 2, 3""",
)

# TPC-H Q10 shape: returned-item revenue per customer, global top-20.
register(
    "tpch_q10_returned_items",
    olap_plan.returned_item_reporting,
    f"""SELECT c_custkey, c_name, c_nationkey,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_returns
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{olap_plan.Q10_START}'
  AND o_orderdate < TIMESTAMP '{olap_plan.Q10_END}'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c_custkey LIMIT 20""",
)

# TPC-H Q19 shape: OR-of-ANDs disjunction across joined columns.
_Q19_ARM_SQL = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
    f"AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in olap_plan.Q19_ARMS
)
register(
    "tpch_q19_discounted_revenue",
    olap_plan.discounted_revenue,
    f"""SELECT
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
  CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_Q19_ARM_SQL}""",
)

# TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins of the fact —
# decorrelated to LEFT SEMI + LEFT ANTI in the Spark plan; the oracle
# keeps the correlated form so the driver proves the rewrite exact.
register(
    "tpch_q21_waiting_suppliers",
    olap_plan.waiting_orders_suppliers,
    f"""WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {olap_plan.Q21_LATE_DAYS} DAY
           AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT l1.l_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lo l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{olap_plan.Q21_NATION}'
  AND l1.is_late
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late)
GROUP BY 1, 2
ORDER BY numwait DESC, l1.l_suppkey LIMIT 50""",
)

# Q21 TEXTBOOK form (r10): identical semi/anti self-join shape, but
# lateness is the spec's l_receiptdate > l_commitdate over the
# synthesized shipping columns — the last schema adaptation retired.
from ..sources import synth as synth_mod  # noqa: E402

register(
    "tpch_q21_receipt_form",
    lambda spark, sf: olap_plan.waiting_orders_suppliers(
        spark, sf, lateness="receipt"
    ),
    f"""WITH {synth_mod.LINEITEM_SHIP_CTE},
lo AS (
  SELECT l_orderkey, l_suppkey, l_receiptdate > l_commitdate AS is_late
  FROM lineitem_ship)
SELECT l1.l_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lo l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{olap_plan.Q21_NATION}'
  AND l1.is_late
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late)
GROUP BY 1, 2
ORDER BY numwait DESC, l1.l_suppkey LIMIT 50""",
)

# TPC-H Q8 shape: conditional-aggregation-as-ratio (market share) over
# the full star; share in integer ppm.
register(
    "tpch_q8_market_share",
    olap_plan.national_market_share,
    f"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = '{olap_plan.Q8_NATION}'
                     THEN CAST(round((l_extendedprice * (1 - l_discount))
                                     * 100) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS nation_cents,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                     AS BIGINT)) AS BIGINT) AS region_cents,
       CAST(sum(CASE WHEN n2.n_name = '{olap_plan.Q8_NATION}'
                     THEN CAST(round((l_extendedprice * (1 - l_discount))
                                     * 100) AS BIGINT) ELSE 0 END) * 1000000
            // sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                        AS BIGINT)) AS BIGINT) AS share_ppm
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = '{olap_plan.Q8_TYPE}'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = '{olap_plan.Q8_REGION}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE o_orderdate >= TIMESTAMP '{olap_plan.Q8_START}'
  AND o_orderdate < TIMESTAMP '{olap_plan.Q8_END}'
GROUP BY 1""",
)

# TPC-H Q13 shape: left-outer fact join + double aggregation (zero-order
# customers included).
register(
    "tpch_q13_customer_distribution",
    olap_plan.customer_order_distribution,
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1) t
GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",
)

# TPC-H Q15 shape: view + scalar-max subquery -> 1-row broadcast join.
register(
    "tpch_q15_top_supplier",
    olap_plan.top_supplier,
    f"""WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                       AS BIGINT)) AS BIGINT) AS total_rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{olap_plan.Q15_START}'
    AND l_shipdate < TIMESTAMP '{olap_plan.Q15_END}'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_rev_cents
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev)""",
)

# TPC-H Q14 shape: conditional aggregation (CASE inside sum) over the
# lineitem x part equi join; share reported in integer ppm.
register(
    "tpch_q14_promo_revenue",
    olap_plan.promo_revenue_share,
    f"""SELECT
  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END) AS BIGINT)
    AS promo_cents,
  CAST(sum(rc) AS BIGINT) AS total_cents,
  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END) * 1000000
       // sum(rc) AS BIGINT) AS promo_share_ppm
FROM (SELECT CAST(round(l_extendedprice * (1 - l_discount) * 100)
             AS BIGINT) AS rc, p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '{olap_plan.Q14_MONTH_START}'
        AND l_shipdate < TIMESTAMP '{olap_plan.Q14_MONTH_END}') t""",
)

