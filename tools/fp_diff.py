"""Diff physical-plan fingerprints between two WINDOW_REPLICA records.

Usage: python tools/fp_diff.py WINDOW_REPLICA_r08.json /tmp/check_all.json

Prints one line per entry whose normalized plan shape changed (or that
gained/lost a fingerprint) — the cross-round regression check for silent
plan changes (broadcast->SMJ flip, lost pushdown, new exchange) that
timing noise can hide. Entries present in only one record are reported
as added/removed; streaming_* entries carry no fingerprint by design.
Exit code 0 when nothing differs, 1 otherwise (usable as a gate).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    changed = 0
    for name in sorted(set(a) | set(b)):
        fa = a.get(name, {}).get("plan_fp")
        fb = b.get(name, {}).get("plan_fp")
        if name not in a or name not in b:
            print(f"{'added' if name not in a else 'removed':8s} {name}")
            changed += 1
        elif fa != fb:
            print(f"CHANGED  {name}: {fa} -> {fb}")
            changed += 1
    print(f"{changed} fingerprint diffs across {len(set(a) | set(b))} entries")
    return 1 if changed else 0


if __name__ == "__main__":
    sys.exit(main())
