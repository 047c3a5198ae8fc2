"""Diff two committed bench records against the ±2x band contract.

Usage: python tools/bench_diff.py BENCH_LOCAL_r10.json BENCH_LOCAL_r11.json
         [--band 2.0] [--min-sec 0.5]

Prints, for the batch lane and (when both records carry one) the
streaming lane:
  - common-set total ratio (the round-over-round headline),
  - entries added / removed,
  - the largest movers above --min-sec (noise floor: sub-half-second
    entries swing with ambient load and are exempt per BASELINE.md),
  - BAND VIOLATIONS: common entries >= --min-sec whose ratio leaves
    [1/band, band]. Exits 1 if any, so the check can gate a round.

The committed quiet freeze record is the authoritative side of every
comparison (BASELINE.md protocol); driver-era re-runs live in
*_driver.json and can be diffed the same way, read with that caveat.
"""

from __future__ import annotations

import argparse
import json
import sys


def lane(a: dict, b: dict, name: str, band: float, min_sec: float) -> int:
    qa, qb = a.get(name) or {}, b.get(name) or {}
    if name == "queries":
        qa, qb = a["queries"], b["queries"]
    if not qa or not qb:
        print(f"[{name}] missing in one record — skipped")
        return 0
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
    bad = [t for t in scored if t[0] > band or t[0] < 1 / band]
    for r, n, x, y in bad:
        kind = "regression" if r > 1 else "speedup — re-anchor if real"
        print(
            f"  BAND VIOLATION ({band}x, {kind}): {n} {x} -> {y} = {r:.2f}x"
        )
    return len(bad)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--band", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.5)
    args = ap.parse_args()
    with open(args.old) as f:
        a = json.load(f)
    with open(args.new) as f:
        b = json.load(f)
    n_bad = lane(a, b, "queries", args.band, args.min_sec)
    n_bad += lane(a, b, "streaming", args.band, args.min_sec)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
