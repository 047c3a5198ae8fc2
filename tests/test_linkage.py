"""Record-linkage (entity resolution) semantics and scale-shape gates."""

from __future__ import annotations

from .conftest import SF_SMOKE

from flink_realtime_datawarehouse_v3_spark.operators import linkage
from flink_realtime_datawarehouse_v3_spark.sources import tables


def test_er_resolves_every_variant_correctly(spark):
    """The multi-pass blocking guarantee, end to end: EVERY injected
    single-edit variant (both noise types, every key-derived edit
    position present at this SF) must resolve, and to its true canonical
    key — recall and precision 1.0 on the injected noise model."""
    customer = tables.load(spark, SF_SMOKE, "customer")
    n_variants = linkage.inject_noisy_customers(customer).count()
    rows = linkage.resolve_customers(spark, SF_SMOKE).collect()
    assert len(rows) == n_variants > 0
    assert all(r.is_correct == 1 for r in rows)
    # Both noise families actually occurred (deletion shortens the name
    # by one; its winning edit distance is 1 either way) and edit
    # positions cover prefix-breaking AND suffix-breaking cases, so the
    # two-pass union is genuinely exercised, not just one pass.
    variants = linkage.inject_noisy_customers(customer).collect()
    lens = {len(v.v_name) for v in variants}
    assert lens == {17, 18}, lens
    positions = {
        (v.true_key % linkage.NAME_DIGITS) + linkage.NAME_DIGIT_BASE
        for v in variants
    }
    assert min(positions) <= linkage.PREFIX_LEN  # prefix-pass misses exist
    assert max(positions) > len("Customer#") + linkage.NAME_DIGITS - linkage.SUFFIX_LEN


def test_er_single_edit_blocking_guarantee(spark):
    """Structural recall property of the pass pair: for every variant,
    at least one blocking key (prefix or suffix) is byte-identical to
    its true customer's key — the pigeonhole argument in the module
    docstring, checked exhaustively over the injected set."""
    customer = tables.load(spark, SF_SMOKE, "customer")
    variants = linkage.inject_noisy_customers(customer)
    clean = {r.c_custkey: r.c_name for r in customer.collect()}
    for v in variants.collect():
        true_name = clean[v.true_key]
        pre_ok = v.v_name[: linkage.PREFIX_LEN] == true_name[: linkage.PREFIX_LEN]
        suf_ok = v.v_name[-linkage.SUFFIX_LEN :] == true_name[-linkage.SUFFIX_LEN :]
        assert pre_ok or suf_ok, (v.variant_key, v.v_name, true_name)


def test_er_plan_is_blocked_equi_join(spark):
    """Scale gate: the candidate stage must be equi-joins on the block
    keys — never an all-pairs product — and the best-match cut must be a
    hash aggregate with map-side partials (no window sort, no pair
    DISTINCT exchange beyond the one agg shuffle)."""
    df = linkage.resolve_customers(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    # map-side partial min before the one keyed shuffle (struct min
    # compiles to SortAggregate — per-partition sorts, never global)
    assert "partial_min" in plan
