"""Promote the pinned-bench reference vector (explicit, once per round).

bench.py never rewrites the committed BENCH_PINNED_REF.json: each
qualifying run (measured slowdown <= 1.05) writes its tightening
proposal to the gitignored BENCH_PINNED_REF.proposed.json. This tool
merges the proposal into the committed vector (element-wise MIN, with
the same guards bench.normalize_pinned applies: sub-50ms entries never
tighten, one promotion tightens an entry by at most 2x) and prints the
diff. Run it AFTER the driver's graded bench run, commit the result,
and every run in the next round normalizes against one fixed vector.

Host-change re-baseline (README policy): when every run on a new box
flags HOST (or SUSPECT-ENGINE pre-fingerprint) at a stable ratio and
the old-tag control reproduces it, the auto-proposal path can never
qualify (slowdown <= 1.05 is unreachable on a slower host by
construction). ``--rebaseline [bench_json]`` replaces the committed
vector WHOLESALE with one designated run's pinned map (default
BENCH_local.json) and stamps the run's host fingerprint as
``__host_probe_sec__`` — commit the result with a message saying the
host changed. Refuses a loaded run (load1_start >= 2) without --force.

Usage: python tools/promote_pinned_ref.py [--dry-run]
       python tools/promote_pinned_ref.py --rebaseline [bench_json] [--force]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.path.join(HERE, "BENCH_PINNED_REF.json")
PROPOSED = os.path.join(HERE, "BENCH_PINNED_REF.proposed.json")


def rebaseline(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    src = args[0] if args else os.path.join(HERE, "BENCH_local.json")
    with open(src) as fh:
        run = json.load(fh)
    pinned = run.get("pinned") or {}
    if not pinned:
        print(f"{src} has no pinned map — run bench.py first")
        return 1
    load1 = run.get("load1_start")
    if load1 is not None and load1 >= 2 and "--force" not in argv:
        print(f"refusing: designated run started at load1={load1} "
              "(policy: one CLEAN run re-baselines; --force to override)")
        return 1
    new_ref = dict(sorted(pinned.items()))
    if run.get("host_probe_sec"):
        new_ref["__host_probe_sec__"] = run["host_probe_sec"]
    if run.get("host_probe_py"):
        # interpreter build the probe was measured under (r14 ADVICE);
        # bench refuses the HOST verdict when it no longer matches
        new_ref["__host_probe_py__"] = run["host_probe_py"]
    print(f"re-baseline from {src}: {len(pinned)} entries, "
          f"load1_start={load1}, "
          f"host_probe_sec={run.get('host_probe_sec')}")
    if "--dry-run" in argv:
        return 0
    with open(REF, "w") as fh:
        json.dump(new_ref, fh, indent=1, sort_keys=True)
    if os.path.exists(PROPOSED):
        os.remove(PROPOSED)
    print(f"replaced -> {REF} (commit it with a host-change note)")
    return 0


def main() -> int:
    if "--rebaseline" in sys.argv:
        return rebaseline([a for a in sys.argv[1:] if a != "--rebaseline"])
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
        if n.startswith("__"):  # metadata (probe sec / py), never merged
            continue
        if n not in merged:
            merged[n] = t
            changes.append(f"  + {n}: {t}")
        elif merged[n] > 0.05 and t < merged[n]:
            # clamp to the 2x-per-promotion floor instead of skipping
            # (mirrors bench.normalize_pinned): a >2x improvement now
            # closes over successive promotions instead of stalling
            nt = round(max(t, 0.5 * merged[n]), 3)
            if nt < merged[n]:
                changes.append(f"  ~ {n}: {merged[n]} -> {nt}")
                merged[n] = nt
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
