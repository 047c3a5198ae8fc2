"""Physical-plan fingerprinting, shared by the telemetry recorder
(tools/check_all.py), the cross-round differ (tools/fp_diff.py) and the
in-suite regression gate (tests/test_plans.py).

The fingerprint hashes the operator-kind sequence of the executed plan
string — expression ids, codegen ids, paths and literals are stripped —
so a silent plan regression (broadcast->SMJ flip, lost pushdown, a new
exchange) changes the fingerprint while timing noise and id churn do
not.
"""

from __future__ import annotations

import hashlib
import re

_OP = re.compile(r"^[\s+\-:*()0-9]*([A-Za-z][A-Za-z0-9_]*)")


def fingerprint_plan_string(plan: str) -> str:
    """md5 (16 hex chars) over one operator token per plan line.

    ``== Final Plan ==`` sections are stripped, keeping only each
    adaptive subtree's ``== Initial Plan ==`` shape: a cached relation
    (shared memoized input) renders its child as the original plan
    before materialization but flips to a two-section final/initial
    rendering with extra ``*QueryStage`` / ``ColumnarToRow`` runtime
    nodes afterwards — execution state, not plan shape. Without the
    strip an entry's fingerprint depends on whether a shared memo
    happened to be materialized first (the build-order flakiness that
    hit dedup_* in round 9)."""
    ops = []
    skipping = 0
    for line in plan.splitlines():
        if "== Final Plan ==" in line:
            skipping += 1
            continue
        if "== Initial Plan ==" in line:
            if skipping:
                skipping -= 1
            continue
        if skipping:
            continue
        m = _OP.match(line)
        if m:
            ops.append(m.group(1))
    return hashlib.md5("\n".join(ops).encode()).hexdigest()[:16]


def fingerprint(sdf) -> str:
    """Fingerprint of a DataFrame's (pre-AQE) executed plan."""
    return fingerprint_plan_string(
        sdf._jdf.queryExecution().executedPlan().toString()
    )
