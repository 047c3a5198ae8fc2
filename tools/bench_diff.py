"""Diff two committed bench records against the ±2x band contract.

Usage: python tools/bench_diff.py BENCH_LOCAL_r10.json BENCH_LOCAL_r11.json
         [--band 2.0] [--min-sec 0.5] [--exempt name ...]

Prints, for the batch lane and (when both records carry one) the
streaming lane:
  - common-set total ratio (the round-over-round headline),
  - entries added / removed,
  - the largest movers above --min-sec (noise floor: sub-half-second
    entries swing with ambient load and are exempt per BASELINE.md),
  - BAND VIOLATIONS: common entries >= --min-sec whose ratio leaves
    [1/band, band]. Exits 1 on any non-exempt REGRESSION (speedups are
    reported but self-re-anchor: the newest freeze is the next base),
    so the check can gate a round.

The documented exemption lists (BASELINE.md) are encoded in
``DEFAULT_EXEMPT`` so the CLI and the pytest gate
(tests/test_bench_band.py) agree; --exempt adds to them. The committed
quiet freeze record is the authoritative side of every comparison
(BASELINE.md protocol); driver-era re-runs live in *_driver.json and
can be diffed the same way, read with that caveat.
"""

from __future__ import annotations

import argparse
import json
import sys

# BASELINE.md's documented ambient-swing exemptions: Arrow-Python-worker
# entries whose wall time tracks box load, not plan changes (batch:
# text_bpe_tokenize swung 8.1x across identical r10 runs; the CJK
# keyword windows share the Arrow UDTF worker), and the two heavy
# Python-state streaming replays (131-196 s and 83-148 s across five
# identical r11 runs). An INTENTIONAL plan change to an exempt entry
# still shows in the printed movers — exemption only silences the exit
# code, not the report.
DEFAULT_EXEMPT = {
    "text_bpe_tokenize",
    "dws_traffic_keyword_cjk_window",
    "dws_keyword_window_udtf_sql",
    "streaming_keyword_cjk_window",
    "streaming_order_info_debounce",
    "streaming_order_pre_process",
}


def lane(
    a: dict,
    b: dict,
    name: str,
    band: float = 2.0,
    min_sec: float = 0.5,
    exempt: frozenset | set = frozenset(),
) -> list[str]:
    """Compare one lane; print the report; return the NON-EXEMPT band
    violations (entry names)."""
    qa, qb = a.get(name) or {}, b.get(name) or {}
    if name == "queries":
        qa, qb = a["queries"], b["queries"]
    if not qa or not qb:
        print(f"[{name}] missing in one record — skipped")
        return []
    common = sorted(set(qa) & set(qb))
    ta, tb = sum(qa[n] for n in common), sum(qb[n] for n in common)
    print(f"[{name}] common {len(common)}: {ta:.1f}s -> {tb:.1f}s "
          f"= {tb / ta:.2f}x | added {sorted(set(qb) - set(qa))} "
          f"| removed {sorted(set(qa) - set(qb))}")
    scored = [
        (qb[n] / max(qa[n], 1e-9), n, qa[n], qb[n])
        for n in common
        if max(qa[n], qb[n]) >= min_sec
    ]
    for r, n, x, y in sorted(scored, reverse=True)[:8]:
        print(f"  {r:5.2f}x  {n}  {x} -> {y}")
    bad = []
    for r, n, x, y in scored:
        if 1 / band <= r <= band:
            continue
        kind = "regression" if r > 1 else "speedup (self-re-anchors)"
        tag = " [exempt]" if n in exempt else ""
        print(
            f"  BAND VIOLATION ({band}x, {kind}){tag}: {n} {x} -> {y} "
            f"= {r:.2f}x"
        )
        # Only REGRESSIONS gate: a real speedup becomes the next
        # round's anchor automatically (newest freeze is the base), and
        # a bogus speedup (operator stopped doing work) is what the
        # correctness board + plan-fingerprint gates exist to catch.
        if n not in exempt and r > band:
            bad.append(n)
    return bad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--band", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.5)
    ap.add_argument("--exempt", nargs="*", default=[])
    args = ap.parse_args()
    with open(args.old) as f:
        a = json.load(f)
    with open(args.new) as f:
        b = json.load(f)
    exempt = DEFAULT_EXEMPT | set(args.exempt)
    bad = lane(a, b, "queries", args.band, args.min_sec, exempt)
    bad += lane(a, b, "streaming", args.band, args.min_sec, exempt)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
