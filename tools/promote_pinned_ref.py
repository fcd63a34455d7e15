"""Promote the pinned-bench reference vector (explicit, once per round).

bench.py never rewrites the committed BENCH_PINNED_REF.json: each
qualifying run (measured slowdown <= 1.05) writes its tightening
proposal to the gitignored BENCH_PINNED_REF.proposed.json. This tool
merges the proposal into the committed vector (element-wise MIN, with
the same guards bench.normalize_pinned applies: sub-50ms entries never
tighten, one promotion tightens an entry by at most 2x) and prints the
diff. Run it AFTER the driver's graded bench run, commit the result,
and every run in the next round normalizes against one fixed vector.

Usage: python tools/promote_pinned_ref.py [--dry-run]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.path.join(HERE, "BENCH_PINNED_REF.json")
PROPOSED = os.path.join(HERE, "BENCH_PINNED_REF.proposed.json")


def main() -> int:
    if not os.path.exists(PROPOSED):
        print("no proposal file — nothing to promote")
        return 0
    with open(PROPOSED) as fh:
        proposed = json.load(fh)
    ref = {}
    if os.path.exists(REF):
        with open(REF) as fh:
            ref = json.load(fh)
    merged, changes = dict(ref), []
    for n, t in sorted(proposed.items()):
        if n not in merged:
            merged[n] = t
            changes.append(f"  + {n}: {t}")
        elif merged[n] > 0.05 and 0.5 * merged[n] <= t < merged[n]:
            changes.append(f"  ~ {n}: {merged[n]} -> {t}")
            merged[n] = t
    if not changes:
        print("proposal tightens nothing — committed vector unchanged")
        return 0
    print(f"{len(changes)} entries:")
    print("\n".join(changes))
    if "--dry-run" in sys.argv:
        return 0
    with open(REF, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    os.remove(PROPOSED)
    print(f"promoted -> {REF} (commit it)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
