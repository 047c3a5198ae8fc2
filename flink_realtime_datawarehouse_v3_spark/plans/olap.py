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

from ..sources import synth, tables

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


Q17_BRAND, Q17_TYPE = "Brand#23", "MEDIUM"


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue lost to
    orders below 20 % of a part's average order quantity, for one
    brand/type slice.

    The correlated scalar subquery (``l_quantity < 0.2 * avg(l_quantity)
    per part``) is decorrelated by hand into the plan Catalyst would pick
    anyway — and the plan a 100 TB run needs:

    1. filter ``part`` first (brand+type selects ~0.6 % of parts) and
       BROADCAST it into lineitem — the big scan is pruned to the slice
       before anything else happens;
    2. aggregate the restricted lineitems per part (the avg subquery is
       correlated only on ``p_partkey`` and its population is invariant
       under the part-attribute filter, so restricting first is exact);
       the result is ≤ |filtered parts| rows, so it also rides a
       BROADCAST back onto the restricted scan — never a per-row
       subquery, never a shuffle join (both joins plan-gated);
    3. the threshold compares exact integers: ``l_quantity`` is integral
       by construction, so ``qty < 0.2 * sum/cnt  ⇔  5*qty*cnt < sum``
       — no float division crosses the comparison, and the same rows
       qualify in every engine and every row order.

    One output row: total qualifying revenue in integer cents and the
    qualifying lineitem count (``avg_yearly`` in spec units is
    ``revenue/7``; kept as cents DIV 7 to stay in exact integers).
    """
    p = (
        tables.load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == Q17_BRAND) & (F.col("p_type") == Q17_TYPE))
        .select("p_partkey")
    )
    lp = (
        tables.load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            F.col("l_quantity").cast("bigint").alias("qty"),
            _cents(F.col("l_extendedprice")).alias("price_cents"),
        )
    )
    per_part = lp.groupBy("l_partkey").agg(
        F.sum("qty").alias("part_sum_qty"),
        F.count(F.lit(1)).alias("part_cnt"),
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        lp.join(F.broadcast(per_part), lp.l_partkey == F.col("t_partkey"))
        .filter(F.col("qty") * 5 * F.col("part_cnt") < F.col("part_sum_qty"))
        .agg(
            F.sum("price_cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_small_lineitems"),
            F.expr("sum(price_cents) DIV 7").alias("avg_yearly_cents"),
        )
    )


Q20_NAME_PREFIX = "small"
Q20_YEAR_START, Q20_YEAR_END = "1996-01-01", "1997-01-01"


def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested semi chain with a groupwise threshold),
    adapted to this schema (no ``partsupp``/``ps_availqty``): suppliers
    who DOMINATED at least one 'small%' part in 1996 — shipped more than
    half of that part's total 1996 quantity.

    The reference query's nested ``IN (... WHERE qty > (SELECT 0.5 *
    sum(..) correlated))`` decorrelates to an agg-then-join-then-semi
    chain, each hop presenting the smallest possible side:

    1. ``part`` name-prefix filter (~13 % of parts) broadcasts into the
       1996 lineitem slice — scan pruned before the shuffle;
    2. ONE hash agg per (part, supplier) pair; the per-part total is a
       SECOND agg over those pair rows (|parts| rows, never re-scanning
       lineitem) and broadcasts back onto the pairs — the groupwise
       threshold costs one lineitem shuffle total;
    3. ``2*pair_qty > part_total`` in exact integers, then the
       qualifying supplier ids LEFT-SEMI into ``supplier`` — the probe
       never duplicates suppliers however many parts they dominate.

    Output: (s_suppkey, s_name, n_name) of dominating suppliers, nation
    attached via a forced 25-row broadcast.
    """
    p = (
        tables.load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    pairs = (
        tables.load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q20_YEAR_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_YEAR_END).cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", F.col("l_quantity").cast("bigint").alias("qty"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty").alias("pair_qty"))
    )
    totals = pairs.groupBy("l_partkey").agg(
        F.sum("pair_qty").alias("part_total")
    ).withColumnRenamed("l_partkey", "t_partkey")
    dominating = (
        pairs.join(F.broadcast(totals), pairs.l_partkey == F.col("t_partkey"))
        .filter(F.col("pair_qty") * 2 > F.col("part_total"))
        .select("l_suppkey")
    )
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(dominating, s.s_suppkey == dominating.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-avg scalar subquery + anti join):
    customers whose balance beats the average POSITIVE balance but who
    never placed an order, counted per nation.

    Two decorrelation flavors in one plan: the uncorrelated scalar
    subquery (global avg) is a 1-row aggregate that rides the plan as a
    broadcast-nested-loop of exactly one row — constant-size, legal at
    any SF — and the ``NOT EXISTS`` compiles to a LEFT ANTI join on the
    equi key, probing orders once. Threshold in exact integers:
    ``acctbal_cents * n_pos > sum_pos_cents`` avoids cross-engine float
    division.
    """
    c = tables.load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        _cents(F.col("c_acctbal")).alias("acctbal_cents"),
    )
    pos = c.filter(F.col("acctbal_cents") > 0).agg(
        F.sum("acctbal_cents").alias("sum_pos_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    o = tables.load(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(F.broadcast(pos))
        .filter(F.col("acctbal_cents") * F.col("n_pos") > F.col("sum_pos_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("acctbal_cents").alias("total_cents"),
        )
    )


Q6_START, Q6_END = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_MAX_QTY = 24


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure scan-filter-agg —
    every predicate (date range, discount band, quantity cap) must reach
    the parquet footer (plan-gated), so at 100 TB the scan skips row
    groups on statistics and reads 4 columns. No join, no shuffle beyond
    the single partial-agg exchange."""
    l = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q6_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_END).cast("timestamp"))
        & (F.col("l_discount") >= Q6_DISC_LO)
        & (F.col("l_discount") <= Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_MAX_QTY)
    )
    return l.agg(
        F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))).alias(
            "revenue_cents"
        ),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


Q7_NATION_A, Q7_NATION_B = "NATION_3", "NATION_7"
Q7_START, Q7_END = "1995-01-01", "1997-01-01"


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    nations, grouped by (supplier nation, customer nation, ship year).
    The disjunctive nation-pair predicate ((A,B) or (B,A)) applies AFTER
    both nation hops resolve; nation is a forced 25-row broadcast twice
    (two roles), customer/supplier scale with SF and stay honest
    equi-shuffles, lineitem x orders is the whitelisted fact-fact SMJ —
    the same sizing discipline as Q5."""
    l = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q7_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_END).cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_cents"
        ),
    )
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == Q7_NATION_A)
        & (F.col("cust_nation") == Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == Q7_NATION_B)
        & (F.col("cust_nation") == Q7_NATION_A)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum("rev_cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q10_START, Q10_END = "1995-10-01", "1996-01-01"


def returned_item_reporting(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-k customers by
    revenue lost to returns in one quarter. The returnflag filter prunes
    lineitem at the scan; orders' date filter prunes before the
    fact-fact join; the customer join presents the |quarter's customers|
    aggregate, and the k-cut compiles to TakeOrderedAndProject
    (plan-gated with the other global top-ks)."""
    l = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select(
        "l_orderkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_cents"
        ),
    )
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = tables.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    per_cust = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum("rev_cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_returns"),
        )
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "c_nationkey", "revenue_cents", "n_returns")
        .orderBy(F.col("revenue_cents").desc(), "c_custkey")
        .limit(k)
    )


# Q19-style disjunctive pushdown: three (brand, size-band, quantity-band)
# arms OR-ed together, adapted to this schema (no p_container).
Q19_ARMS = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
)


def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, OR-of-ANDs): the classic
    disjunctive predicate across joined columns. The join itself is the
    equi key; each arm's part-side conjuncts (brand, size band) and
    lineitem-side conjuncts (quantity band) sit inside the OR, so the
    optimizer must (a) keep the equi join out of the disjunction and
    (b) push the derivable per-side bounds (size/quantity envelopes) to
    the scans. One aggregate row out."""
    l = tables.load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_cents"
        ),
    )
    p = tables.load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arms = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in Q19_ARMS:
        arm = (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(size_lo, size_hi))
            & (F.col("l_quantity").between(qty_lo, qty_hi))
        )
        arms = arm if arms is None else arms | arm
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(arms)
        .agg(
            F.sum("rev_cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q21_LATE_DAYS = 90
Q21_NATION = "NATION_5"


def waiting_orders_suppliers(
    spark: SparkSession, sf_dir: str, k: int = 50, lateness: str = "shipdate"
) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for one
    nation's suppliers, count multi-supplier orders where THIS supplier
    was late and NO OTHER supplier on the order was.

    Two lateness forms, identical plan shape: ``shipdate`` (the original
    r9 adaptation — shipped > 90 days after the order date, predating
    the synthesized columns) and ``receipt`` (the TEXTBOOK predicate
    ``l_receiptdate > l_commitdate`` over the r10 derived shipping
    columns, registered as tpch_q21_receipt_form).

    The two correlated EXISTS / NOT EXISTS over the same fact
    decorrelate into a LEFT SEMI and a LEFT ANTI self-join of lineitem
    on the order key (suppkey inequality as the join condition) — the
    one classic shape where the fact self-joins twice; both hops are
    equi-shuffles on l_orderkey (whitelisted SMJ: no side of a
    fact-fact self-join is broadcastable at 100 TB). The one-nation
    supplier slice (~4 % of rows) is written as the first join, but
    Catalyst hoists the broadcast above the semi/anti hops at plan
    time; with runtime stats (CBO/AQE at scale) the slice lands below
    the shuffles — either way it rides as a broadcast, never a
    shuffle."""
    if lateness == "receipt":
        lo = synth.lineitem_shipping(spark, sf_dir).select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_receiptdate") > F.col("l_commitdate")).alias("is_late"),
        )
    else:
        o = tables.load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate"
        )
        lo = (
            tables.load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_suppkey", "l_shipdate")
            .join(o, F.col("l_orderkey") == o.o_orderkey)
            .select(
                "l_orderkey",
                "l_suppkey",
                (
                    F.col("l_shipdate")
                    > F.date_add(F.col("o_orderdate"), Q21_LATE_DAYS)
                ).alias("is_late"),
            )
        )
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation").filter(F.col("n_name") == Q21_NATION)
    nation_supps = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", "s_name")
    l1 = (
        lo.filter(F.col("is_late"))
        .join(
            F.broadcast(nation_supps),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = lo.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = lo.filter(F.col("is_late")).select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        l1.join(  # EXISTS: another supplier on the same order
            l2,
            (l1.l_orderkey == F.col("o2")) & (l1.l_suppkey != F.col("sk2")),
            "left_semi",
        )
        .join(  # NOT EXISTS: no OTHER supplier shipped late on it
            l3,
            (l1.l_orderkey == F.col("o3")) & (l1.l_suppkey != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        waiting.groupBy("l_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "l_suppkey")
        .limit(k)
    )


Q8_REGION, Q8_NATION, Q8_TYPE = "ASIA", "NATION_7", "STANDARD"
Q8_START, Q8_END = "1995-01-01", "1997-01-01"


def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of a
    region's revenue for one part type, per order year — the
    conditional-aggregation-as-ratio pattern (numerator = CASE inside
    sum) over the full star. Sizing: part's type filter broadcasts the
    surviving keys into lineitem first (scan pruned before any
    shuffle); nation/region are forced broadcasts, customer/supplier
    honest equi-shuffles, lineitem x orders the whitelisted fact-fact
    SMJ. Share in integer ppm via DIV."""
    p = tables.load(spark, sf_dir, "part").filter(
        F.col("p_type") == Q8_TYPE
    ).select("p_partkey")
    l = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_cents"
        ),
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q8_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    c = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_cust = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_supp = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = tables.load(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_REGION
    ).select("r_regionkey")
    num = F.when(F.col("supp_nation") == Q8_NATION, F.col("rev_cents")).otherwise(
        F.lit(0)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cr_key") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("o_year")
        .agg(
            F.sum(num).alias("nation_cents"),
            F.sum("rev_cents").alias("region_cents"),
        )
        .select(
            "o_year",
            "nation_cents",
            "region_cents",
            # decimal(38,0) headroom: cents * 1e6 overflows int64 at the
            # 100 TB point (~2e16 cents/group * 1e6 = 2e22); the DuckDB
            # twin is already exact via HUGEINT (round-9 review catch).
            F.expr(
                "CAST(CAST(nation_cents AS DECIMAL(38,0)) * 1000000"
                " DIV region_cents AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): histogram of customers
    by their order count, INCLUDING zero-order customers — the
    left-outer fact join + double aggregation. The outer join keeps
    every customer (count(o_orderkey) counts matches only, never
    NULLs); the first agg collapses to |customers| rows before the
    tiny histogram agg. customer x orders is fact-fact at 100 TB —
    whitelisted SMJ posture, AQE broadcast at test SF."""
    c = tables.load(spark, sf_dir, "customer").select("c_custkey")
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q15_START, Q15_END = "1996-01-01", "1996-04-01"


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): suppliers whose quarterly revenue
    equals the maximum — the view + scalar-max subquery. Decorrelated:
    the per-supplier revenue agg feeds a 1-row max that rides back as a
    BroadcastNestedLoopJoin (constant size at any SF; the Q22 posture),
    then the winners join supplier for names. Exact integers end to
    end, so 'equals the max' is engine-stable."""
    rev = (
        tables.load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("total_rev_cents")
        )
    )
    mx = rev.agg(F.max("total_rev_cents").alias("max_rev_cents"))
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev_cents") == F.col("max_rev_cents"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_cents")
    )


Q14_MONTH_START, Q14_MONTH_END = "1995-09-01", "1995-10-01"


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion revenue share): fraction of one
    month's revenue from PROMO-type parts, in parts-per-million.
    Conditional aggregation (CASE inside sum) over a lineitem x part
    equi join; part carries only (key, is_promo flag) into the join.
    At 100 TB part scales with SF so the join is an equi-shuffle AQE may
    demote to broadcast — same honest sizing as Q5. The ppm share uses
    integer DIV so no float division crosses engines."""
    l = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_MONTH_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_MONTH_END).cast("timestamp"))
    )
    p = tables.load(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("is_promo"), rev).otherwise(F.lit(0))).alias(
                "promo_cents"
            ),
            F.sum(rev).alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            # decimal(38,0) headroom for the *1e6 (same posture as Q8).
            F.expr(
                "CAST(CAST(promo_cents AS DECIMAL(38,0)) * 1000000"
                " DIV total_cents AS BIGINT)"
            ).alias("promo_share_ppm"),
        )
    )


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


# --- TPC-H closure over the SYNTHESIZED partsupp / shipping columns ----------
# (sources/synth.py: pure-arithmetic relations shared row-for-row with the
# DuckDB oracles; reference queries Q2/Q9/Q11/Q12/Q16 were previously
# unimplementable on the fixture schema — r9 verdict item #4.)

Q2_SIZE, Q2_TYPE, Q2_REGION = 15, "LARGE", "EUROPE"


def min_cost_supplier(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for parts of one size/type, the
    supplier(s) in one region offering the part at its regional minimum
    supply cost. The classic correlated min-per-group subquery over a
    4-way join, decorrelated to agg-then-join-back:

    - the ELIGIBLE frame (partsupp x supplier x nation x region-slice)
      is built ONCE; region/nation ride broadcasts, supplier is an
      equi-shuffle AQE broadcasts at test SF (15e9 rows at 100 TB —
      honest sizing, same posture as Q5);
    - the per-part minimum is an aggregate of that frame joined back on
      (partkey, cost == min) — never a per-row subquery; both the agg
      and the join key on ps_partkey, so at scale the join-back reuses
      the partitioning (no extra exchange between agg and join);
    - the part filter (size + type) prunes before the join, and the
      top-k compiles to TakeOrderedAndProject under the total order
      (acctbal DESC, n_name, s_name, p_partkey — s_name is unique per
      supplier so the cut is deterministic).
    """
    ps = synth.partsupp(spark, sf_dir)
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    eligible = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            "ps_partkey",
            "ps_suppkey",
            "ps_supplycost_cents",
            "s_name",
            _cents(F.col("s_acctbal")).alias("s_acctbal_cents"),
            "n_name",
        )
    )
    p = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE)
    )
    sized = eligible.join(
        F.broadcast(p), F.col("ps_partkey") == p.p_partkey
    )
    minc = sized.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost_cents").alias("min_cost_cents")
    )
    return (
        sized.join(
            minc,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost_cents") == F.col("min_cost_cents")),
        )
        .select(
            "s_acctbal_cents",
            "s_name",
            "n_name",
            F.col("p_partkey"),
            "p_brand",
            "ps_supplycost_cents",
        )
        .orderBy(
            F.col("s_acctbal_cents").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(k)
    )


Q9_NAME_SUB = "red"


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): per (supplier nation, order year)
    the profit on parts whose name contains a substring — revenue minus
    supply cost, both exact integer cents so the sums are
    order-independent across engines.

    Join sizing at 100 TB: lineitem x partsupp on the composite
    (partkey, suppkey) is fact-fact (partsupp is |part| x 4 ~ 8e9 rows)
    — an equi-shuffle SMJ, whitelisted; the name-filtered part slice
    prunes lineitem FIRST (broadcast at test SF, semi-style at scale);
    orders joins on the orderkey shuffle lineitem already has from
    nothing — one exchange each; nation is a true-dim broadcast."""
    p = tables.load(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_NAME_SUB)
    ).select("p_partkey")
    ps = synth.partsupp(spark, sf_dir)
    l = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = tables.load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - F.col("ps_supplycost_cents") * F.col("l_quantity").cast("bigint")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(
            ps,
            (F.col("l_partkey") == ps.ps_partkey)
            & (F.col("l_suppkey") == ps.ps_suppkey),
        )
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).alias("profit_cents"))
    )


Q11_NATION = "NATION_3"
Q11_FRACTION_DEN = 1000  # part qualifies when value * 1000 > national total


def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): per-part inventory
    value (supplycost x availqty, exact integer cents) held by one
    nation's suppliers, keeping parts above a fixed fraction of the
    national total — the group-HAVING-vs-global-scalar shape. The global
    total is a ONE-ROW aggregate broadcast back (BroadcastNestedLoopJoin
    over 1 row, same posture as Q22's global average); the comparison is
    integer cross-multiplication (value * DEN > total), never float
    division. Both the per-part agg and the total agg reduce the SAME
    nation-sliced frame, so the expensive join work is paid once."""
    ps = synth.partsupp(spark, sf_dir)
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = tables.load(spark, sf_dir, "nation").filter(F.col("n_name") == Q11_NATION)
    sliced = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "ps_partkey",
            (
                F.col("ps_supplycost_cents") * F.col("ps_availqty").cast("bigint")
            ).alias("v_cents"),
        )
    )
    per_part = sliced.groupBy("ps_partkey").agg(
        F.sum("v_cents").alias("value_cents")
    )
    total = sliced.agg(F.sum("v_cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") * Q11_FRACTION_DEN > F.col("total_cents"))
        .select("ps_partkey", "value_cents")
    )


Q12_MODES = ("MAIL", "SHIP")
Q12_YEAR_START, Q12_YEAR_END = "1997-01-01", "1998-01-01"


def shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority): for two ship modes
    and one receipt year, lineitems that were committed before receipt
    and shipped before commit, counted per mode split by order priority
    (the agg-over-CASE two-sided shape). All three date predicates and
    the mode IN-list sit on the derived lineitem columns — pure
    arithmetic over scanned columns, so the scan still prunes on
    l_shipdate (receipt is within +30 d of ship) and the orders join is
    one equi-shuffle that AQE broadcasts at test SF."""
    l = synth.lineitem_shipping(spark, sf_dir).filter(
        F.col("l_shipmode").isin(*Q12_MODES)
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= F.lit(Q12_YEAR_START).cast("date"))
        & (F.col("l_receiptdate") < F.lit(Q12_YEAR_END).cast("date"))
    )
    o = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


Q16_BRAND = "Brand#5"
Q16_TYPE_PREFIX = "MEDIUM"
Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct suppliers able
    to supply parts of selected sizes, excluding one brand, one type
    prefix, and suppliers on the complaint list — adapted to this schema
    as suppliers with NEGATIVE account balance (the fixtures carry no
    s_comment; the predicate stands in for 'Customer Complaints' and
    exercises the same NOT IN -> LEFT ANTI shape). The anti side is a
    |complaining suppliers|-row broadcast; the distinct count shuffles
    once on the (brand, type, size) group key."""
    p = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_BRAND)
        & (~F.col("p_type").startswith(Q16_TYPE_PREFIX))
        & (F.col("p_size").isin(*Q16_SIZES))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = synth.partsupp(spark, sf_dir)
    complainers = (
        tables.load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    return (
        ps.join(
            F.broadcast(complainers),
            ps.ps_suppkey == F.col("bad_suppkey"),
            "left_anti",
        )
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )
