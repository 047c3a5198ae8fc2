"""Column-profiling operator: the statistics pass a data pipeline runs
before trusting a numeric column (count / mean / stddev / min / max /
exact percentiles per group).

Beyond the reference surface: the reference's only aggregates are sums
and counts (SURVEY.md §2.5); a warehouse serving training-data prep also
needs distribution profiles to set quality-filter thresholds.

Determinism across engines: the mean and variance are derived from EXACT
decimal power sums (value has 2 decimals, value^2 has 4 — both sum
without rounding in decimal, so partition/merge order cannot drift the
result), then converted to double through the *identical* expression the
oracle uses. Percentiles use Spark's exact ``percentile`` (sort-based,
linear interpolation) which matches DuckDB's ``quantile_cont``
bit-for-bit — verified, and the profile rounds to 6 decimals anyway.

Scale: one hash aggregation; the percentile agg buffers each group's
values, which is the standard exact-percentile cost — the approximate
twin (``percentile_approx``, t-digest) is the drop-in at 100 TB and is
exposed via ``approx=True`` (rows-only contract, like the HLL entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCTS = (0.5, 0.9, 0.99)


def profile_stats(events: DataFrame, approx: bool = False) -> DataFrame:
    """Per event_type distribution profile of ``value``."""
    s1 = F.sum(F.col("value").cast("decimal(18,2)"))
    s2 = F.sum(
        F.col("value").cast("decimal(18,2)") * F.col("value").cast("decimal(18,2)")
    )
    n = F.count(F.lit(1))
    pct = (
        (lambda p: F.percentile_approx("value", p))
        if approx
        else (lambda p: F.percentile("value", p))
    )
    agg = events.groupBy("event_type").agg(
        n.alias("n_events"),
        s1.alias("__s1"),
        s2.alias("__s2"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        *[pct(p).alias(f"__p{int(p * 100)}") for p in PCTS],
    )
    d1 = F.col("__s1").cast("double")
    d2 = F.col("__s2").cast("double")
    nn = F.col("n_events")
    return agg.select(
        "event_type",
        "n_events",
        F.round(d1 / nn, 6).alias("mean_value"),
        F.round(F.sqrt((d2 - d1 * d1 / nn) / (nn - 1)), 6).alias("stddev_value"),
        "min_value",
        "max_value",
        *[
            F.round(F.col(f"__p{int(p * 100)}"), 6).alias(f"p{int(p * 100)}")
            for p in PCTS
        ],
    )


BIN_WIDTH = 25


def value_histogram(events: DataFrame, bin_width: int = BIN_WIDTH) -> DataFrame:
    """Fixed-width histogram of ``value`` per event_type (the profiling
    companion to :func:`profile_stats` — the distribution's shape, not
    just its quantiles). The bin label is the integer lower bound
    (index * width as bigint — float/decimal labels stringify differently
    across engines); one partial-combining hash agg, exact counts.
    """
    bin_lo = F.floor(F.col("value") / F.lit(float(bin_width))).cast(
        "bigint"
    ) * F.lit(bin_width)
    return (
        events.select("event_type", bin_lo.alias("bin_lo"))
        .groupBy("event_type", "bin_lo")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


PROFILE_COLS = [  # (name, engine-identical canonical string expression)
    ("event_id", "CAST(event_id AS STRING)"),
    ("user_id", "CAST(user_id AS STRING)"),
    ("event_type", "event_type"),
    # doubles and timestamps stringify differently across engines, so
    # they canonicalize through integers first (micro-units / epoch-ms).
    ("value", "CAST(CAST(round(value * 1e6) AS BIGINT) AS STRING)"),
    ("props", "props"),
    ("ts", "CAST(unix_millis(ts) AS STRING)"),
]


def column_profile(events: DataFrame) -> DataFrame:
    """Per-column data-quality profile of the events table — null rate,
    exact distinct count, and the modal value — the table a data-quality
    monitor (Deequ/GE-style) computes before accepting a batch.

    Plan: one stack() unpivot (|cols| x fanout of a projection, no
    Python), ONE hash agg on (column, value), then per-column rollup +
    modal pick over the (column, value, count) table — the second pass
    is bounded by per-column cardinality, never the raw rows. Values
    canonicalize to engine-identical strings (ints as digits, doubles as
    micro-units, timestamps as epoch-ms)."""
    from pyspark.sql import Window

    pairs = ", ".join(f"'{n}', {e}" for n, e in PROFILE_COLS)
    unp = events.select(
        F.expr(f"stack({len(PROFILE_COLS)}, {pairs}) AS (col_name, val)")
    )
    counts = unp.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("col_name").orderBy(
        F.col("c").desc(), F.col("val").asc_nulls_last()
    )
    ranked = counts.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("col_name")
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("val").isNull(), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_null"),
            F.count(F.when(F.col("val").isNotNull(), 1))
            .cast("bigint")
            .alias("n_distinct"),
            F.max(F.when((F.col("rn") == 1) & F.col("val").isNotNull(), F.col("val")))
            .alias("top_value"),
            F.max(F.when((F.col("rn") == 1) & F.col("val").isNotNull(), F.col("c")))
            .cast("bigint")
            .alias("top_count"),
        )
        .select(
            "col_name",
            "n_rows",
            F.expr("n_null * 1000000 DIV n_rows").alias("null_ppm"),
            "n_distinct",
            "top_value",
            "top_count",
        )
    )


# Referential-integrity audit: the star schema's FK edges, each checked
# with one LEFT ANTI join (child keys with no parent). Complements the
# row-local acceptance suite (analytics.expectation_check): those rules
# see one row at a time; orphan detection is inherently a JOIN property.
FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_orphan_audit(spark, sf_dir: str) -> DataFrame:
    """One row per FK edge: child row count, null-FK count, and orphan
    count (non-null child keys with no matching parent).

    One pass per CHILD table, not per edge (r14 optimization round,
    guide §2.4/§1.2): the old shape ran two jobs per edge (a LEFT ANTI
    count plus a totals aggregate, cross-joined) — 21 scans and 14
    single-partition exchanges for 7 edges, with lineitem scanned six
    times. Now each child is scanned ONCE, projected to just its FK
    columns, LEFT-joined against each parent's distinct key column, and
    a single conditional aggregate emits every edge's three numbers;
    the 1-row aggregate explodes into the per-edge rows. Join strategy
    stays the planner's call exactly as before: parent key sets are
    deduplicated and narrow, dims broadcast, and the fact-fact edges
    (lineitem -> orders at 100 TB) remain AQE-sized shuffle joins.
    A left join against a DISTINCT parent key column preserves child
    multiplicity, so counts are unchanged; orphan = FK non-null with no
    parent match — identical to the LEFT ANTI count. Zero orphans on
    this corpus is the point: the audit proves integrity, and any
    future generator bug fails the hash gate with a named edge.
    """
    from pyspark.sql import functions as F

    from ..sources import tables

    by_child: dict[str, list] = {}
    for child, fk, parent, pk in FK_EDGES:
        by_child.setdefault(child, []).append((fk, parent, pk))

    out = None
    for child, edges in by_child.items():
        df = tables.load(spark, sf_dir, child).select(
            *[F.col(fk) for fk, _, _ in edges]
        )
        for fk, parent, pk in edges:
            p = (
                tables.load(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"__pk_{fk}"))
                .distinct()
            )
            df = df.join(p, F.col(fk) == F.col(f"__pk_{fk}"), "left")
        aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
        for fk, _, _ in edges:
            aggs.append(
                F.sum(F.col(fk).isNull().cast("int"))
                .cast("bigint")
                .alias(f"__null_{fk}")
            )
            aggs.append(
                F.sum(
                    (
                        F.col(fk).isNotNull()
                        & F.col(f"__pk_{fk}").isNull()
                    ).cast("int")
                )
                .cast("bigint")
                .alias(f"__orph_{fk}")
            )
        edge_structs = F.array(
            *[
                F.struct(
                    F.lit(f"{child}.{fk}->{parent}.{pk}").alias("edge"),
                    F.col("__n").alias("n_child_rows"),
                    F.col(f"__null_{fk}").alias("n_null_fk"),
                    F.col(f"__orph_{fk}").alias("n_orphans"),
                )
                for fk, parent, pk in edges
            ]
        )
        rows = (
            df.agg(*aggs)
            .select(F.explode(edge_structs).alias("__e"))
            .select("__e.*")
        )
        out = rows if out is None else out.unionByName(rows)
    return out
