"""Classic OLAP query shapes over the TPC-H-ish tables (lineitem /
orders / customer / supplier / nation / region).

These are the scale-canonical plans a 100 TB warehouse lives on, added
beyond the reference surface so the engine's fact-fact SMJ, star
broadcast, and partial-aggregation behavior is exercised on the
lineitem-scale tables (60k rows at sf0.01, but the plans are the ones
that hold at 6e9):

- :func:`pricing_summary` — TPC-H Q1 shape: one scan, filter pushed to
  parquet, hash agg on a 4-group key with map-side partials.
- :func:`shipping_priority` — TPC-H Q3 shape: fact-fact equi join
  (orders x lineitem, SMJ at scale, AQE-broadcast at small SF) + a
  top-10 revenue cut that must compile to TakeOrderedAndProject.
- :func:`local_supplier_volume` — TPC-H Q5 shape: the star join —
  lineitem shuffles ONCE onto orders; supplier/customer/nation/region
  ride broadcast hash joins (plan-gated).

Money arithmetic: every revenue term is rounded to integer CENTS before
summation (round(price * (1 - discount) * 100)); double products of
identical inputs are bit-identical across engines, and the integer sum
is order-independent — the repo's micro-unit convention, so the driver
hash matches without decimal gymnastics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables

Q1_CUTOFF = "1998-09-01"
Q3_DATE = "1995-03-15"


def _cents(expr) -> F.Column:
    return F.round(expr * 100).cast("bigint")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: per (returnflag, linestatus) pricing summary over
    shipped lineitems. One scan with the shipdate filter pushed to the
    parquet footer, one hash agg (map-side combine is Spark-native);
    averages are integer micro-units via DIV so no float sum crosses
    engines."""
    l = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit(Q1_CUTOFF).cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(disc)).alias("sum_disc_cents"),
            F.sum(_cents(disc * (1 + F.col("l_tax")))).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_cents",
            "sum_disc_cents",
            "sum_charge_cents",
            F.expr("sum_qty * 1000000 DIV count_order").alias("avg_qty_micro"),
            F.expr("sum_base_cents DIV count_order").alias("avg_price_cents"),
            "count_order",
        )
    )


def shipping_priority(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3: top-k unshipped orders by accrued revenue. orders x
    lineitem is fact-fact (neither side broadcastable at scale) -> SMJ
    on the equi key, whitelisted; the k-cut compiles to
    TakeOrderedAndProject (plan-gated with the other global top-ks)."""
    o = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    l = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .orderBy(F.col("revenue_cents").desc(), "l_orderkey")
        .limit(k)
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by supplier nation for orders where the
    customer and supplier share a nation. Honest join sizing at 100 TB:
    nation/region are TRUE dims (25/5 rows) and are forced broadcasts;
    customer and supplier scale with SF (15e9 / 1e9 rows at the 100 TB
    point), so their joins stay equi-shuffles that AQE converts to
    broadcast only when runtime sizes allow (they do at test SF). The
    lineitem->orders hop is the fact-fact SMJ, whitelisted."""
    l = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_cents"
        ),
    )
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = tables.load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("cust_nationkey")
    )
    s = tables.load(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("supp_nationkey")
    )
    n = tables.load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = tables.load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(F.col("cust_nationkey") == F.col("supp_nationkey"))
        .join(F.broadcast(n), F.col("supp_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("rev_cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q18_MIN_QTY = 250  # ~99th percentile of per-order quantity


def large_orders(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): aggregate lineitem to
    per-order quantity FIRST, HAVING-filter to the heavy tail, then join
    back to orders — the agg-then-join pattern that presents |orders|
    rows to the join instead of |lineitem|, with the top-20 price cut
    compiling to TakeOrderedAndProject."""
    heavy = (
        tables.load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    o = tables.load(spark, sf_dir, "orders")
    return (
        o.join(heavy, o.o_orderkey == heavy.l_orderkey)
        .select(
            "o_orderkey",
            "o_orderdate",
            _cents(F.col("o_totalprice")).alias("total_cents"),
            "sum_qty",
        )
        .orderBy(F.col("total_cents").desc(), "o_orderkey")
        .limit(k)
    )


Q4_START, Q4_END = "1995-01-01", "1995-04-01"
Q4_LATE_DAYS = 60


def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in one quarter
    with AT LEAST ONE late lineitem (shipped > 60 days after the order
    date), counted per priority. The EXISTS compiles to a LEFT SEMI join
    on the equi key with the lateness predicate as the join condition —
    the probe side never duplicates orders however many lineitems match,
    and the date filter prunes the orders scan before the shuffle."""
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
    )
    l = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.date_add(o.o_orderdate, Q4_LATE_DAYS)),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
