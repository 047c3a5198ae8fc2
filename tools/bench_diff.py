"""Diff two committed bench records against the ±2x band contract.

Usage: python tools/bench_diff.py BENCH_LOCAL_r10.json BENCH_LOCAL_r11.json
         [--band 2.0] [--min-sec 0.5] [--min-delta 1.5] [--exempt name ...]

Prints, for the batch lane and (when both records carry one) the
streaming lane:
  - common-set total ratio (the round-over-round headline),
  - entries added / removed,
  - the largest movers above --min-sec (noise floor: sub-half-second
    entries swing with ambient load and are exempt per BASELINE.md),
  - BAND VIOLATIONS: common entries >= --min-sec whose ratio leaves
    [1/band, band] AND whose absolute swing is >= --min-delta seconds.
    Exits 1 on any non-exempt REGRESSION (speedups are reported but
    self-re-anchor: the newest freeze is the next base), so the check
    can gate a round.

The two floors encode the measured noise model (r13): a pure ratio
test flags 0.2 s -> 0.6 s, but sub-second entries swing 2-3x with
ambient host I/O and Python-worker fork costs on code that has not
changed since r10 (verified by standalone cold/warm A/Bs) — a 3x on
0.3 s is not a regression signal, while a real one (ivfpq's r13
+47.5 s interpreted-eval bug) clears any sane delta floor by an order
of magnitude. Ratio >= band catches big relative moves; delta >=
min-delta keeps them material.

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

# EMPTY since r13 (r12 verdict #6): every former exemption was
# re-measured across the r11/r12 freeze-day records and none swings
# >=1.5x any more, so all six were dropped (rule: an exemption must
# earn its place with a measured >=1.5x ambient swing on current code):
#   text_bpe_tokenize              0.93-1.21 s  (max 1.30x; the 8.1x
#                                  Arrow-worker swing was r10-era)
#   dws_traffic_keyword_cjk_window 2.17-2.54 s  (max 1.17x)
#   dws_keyword_window_udtf_sql    1.43-1.78 s  (max 1.24x)
#   streaming_keyword_cjk_window   5.55-6.23 s  (max 1.12x)
#   streaming_order_info_debounce  64.6-74.6 s  (max 1.15x post the r12
#                                  state-partition fix; the 131-196 s
#                                  r11 swings were the bug itself)
#   streaming_order_pre_process    75.1-75.9 s  (max 1.01x r12-era)
# A future exemption needs its measured-swing line here plus the
# BASELINE.md paragraph. Exemption only silences the exit code, never
# the printed movers report.
#
# Re-seeded r13 (one entry) from the four-freeze matrix on the r13
# closing night (BASELINE.md "Round-13 freeze matrix"):
#   audit_fk_orphans  1.64 / 3.08 / 1.96 / 3.44 s across the four runs
#                     on identical code (max same-night swing 1.76x,
#                     2.10x vs the r12 anchor) — a 5-table FK anti-join
#                     scan whose in-lane reading rides whichever tables
#                     ambient host I/O left warm; standalone warm 7.6 s
#                     proves the in-lane numbers are cache attribution,
#                     not operator cost.
DEFAULT_EXEMPT: set[str] = {"audit_fk_orphans"}


def lane(
    a: dict,
    b: dict,
    name: str,
    band: float = 2.0,
    min_sec: float = 0.5,
    exempt: frozenset | set = frozenset(),
    min_delta: float = 1.5,
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
        if abs(y - x) < min_delta:
            continue  # ratio noise on a small entry, not a material move
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
    ap.add_argument("--min-delta", type=float, default=1.5)
    ap.add_argument("--exempt", nargs="*", default=[])
    args = ap.parse_args()
    with open(args.old) as f:
        a = json.load(f)
    with open(args.new) as f:
        b = json.load(f)
    exempt = DEFAULT_EXEMPT | set(args.exempt)
    bad = lane(
        a, b, "queries", args.band, args.min_sec, exempt, args.min_delta
    )
    bad += lane(
        a, b, "streaming", args.band, args.min_sec, exempt, args.min_delta
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
