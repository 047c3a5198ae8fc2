"""The ±2x bench band contract as a suite gate (r12, verdict #2).

Compares the two newest committed quiet-freeze records
(``BENCH_LOCAL_r{N}.json``; driver-era ``*_driver.json`` re-runs and
``*_failed.json`` provenance records excluded) lane by lane with the
exemption lists encoded in ``tools/bench_diff.DEFAULT_EXEMPT`` — any
non-exempt entry moving more than 2x round-over-round fails the suite,
so a perf regression cannot land silently alongside a green
correctness board. An INTENTIONAL speedup/regression must either land
with its re-anchored freeze in the same commit (the new record becomes
the comparison base) or join the documented exemption list with its
BASELINE.md paragraph.

No Spark session: pure JSON arithmetic, runs in milliseconds.
"""

from __future__ import annotations

import json
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench_diff  # noqa: E402


def _freeze_records() -> list[str]:
    pat = re.compile(r"^BENCH_LOCAL_r(\d+)\.json$")
    recs = sorted(
        (int(m.group(1)), f)
        for f in os.listdir(REPO)
        if (m := pat.match(f))
    )
    return [f for _, f in recs]


def test_bench_band_contract():
    recs = _freeze_records()
    if len(recs) < 2:
        pytest.skip("fewer than two committed freeze records")
    old, new = recs[-2], recs[-1]
    with open(os.path.join(REPO, old)) as f:
        a = json.load(f)
    with open(os.path.join(REPO, new)) as f:
        b = json.load(f)
    bad = bench_diff.lane(
        a, b, "queries", exempt=bench_diff.DEFAULT_EXEMPT
    )
    bad += bench_diff.lane(
        a, b, "streaming", exempt=bench_diff.DEFAULT_EXEMPT
    )
    assert not bad, (
        f"non-exempt >2x movers between {old} and {new}: {bad} — "
        "either a real regression (fix it) or an intentional change "
        "(re-anchor the freeze / extend DEFAULT_EXEMPT with a "
        "BASELINE.md paragraph)"
    )


def test_exemption_list_matches_registry():
    """Every exempt name must still exist in the registry — a renamed
    or deleted entry silently un-exempts nothing and an exemption for
    a ghost entry is stale documentation."""
    os.environ.setdefault("SPARK_GRAFT_ALLOW_ORDER_DRIFT", "1")
    from flink_realtime_datawarehouse_v3_spark import api

    ghosts = bench_diff.DEFAULT_EXEMPT - set(api.QUERIES)
    assert not ghosts, f"exempt entries not in the registry: {ghosts}"
