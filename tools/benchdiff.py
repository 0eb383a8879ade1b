#!/usr/bin/env python3
"""Round-over-round bench comparison, CPU-first (VERDICT r15 #6).

Usage: python3 tools/benchdiff.py OLD_BENCH.json NEW_BENCH.json

Prints wall AND cpu geomean ratios (new/old) over the common query set,
plus the biggest movers by CPU. CPU medians come from executor task CPU
time (GraftShim.addTaskMetricListener) and are load-immune, so the CPU
geomean is the round-over-round gate; wall stays informational (the box
has uniform 1.1-1.4x noise bands).
"""
import json
import math
import sys


def geomean(ratios):
    return math.exp(sum(math.log(r) for r in ratios) / len(ratios)) if ratios else float("nan")


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    for name, rec in (("old", old), ("new", new)):
        if rec.get("box", {}).get("tainted") or rec.get("tainted"):
            print(f"WARNING: {name} record ({rec.get('sf', '?')}) is TAINTED — numbers unreliable")

    def ratios(field):
        o, n = old.get(field, {}), new.get(field, {})
        common = sorted(set(o) & set(n))
        out = {}
        for q in common:
            if o[q] > 0 and n[q] > 0:
                out[q] = n[q] / o[q]
        return out

    wall = ratios("queries")
    cpu = ratios("cpu")
    only_old = sorted(set(old.get("queries", {})) - set(new.get("queries", {})))
    only_new = sorted(set(new.get("queries", {})) - set(old.get("queries", {})))

    print(f"common queries: {len(wall)}  (+{len(only_new)} new, -{len(only_old)} removed)")
    if cpu:
        print(f"cpu  geomean (new/old): {geomean(list(cpu.values())):.3f}   <- the gate")
    else:
        print("cpu  geomean: UNAVAILABLE (a record lacks per-query 'cpu' medians — "
              "pre-r15 format?); falling back to wall, which is load-sensitive")
    print(f"wall geomean (new/old): {geomean(list(wall.values())):.3f}   (informational)")
    print(f"cpu_total_sec: {old.get('cpu_total_sec', '?')} -> {new.get('cpu_total_sec', '?')}"
          f"   wall total: {old.get('value', '?')} -> {new.get('value', '?')}")
    movers = sorted(cpu.items(), key=lambda kv: kv[1])
    improvements = movers[:3]
    regressions = [m for m in movers[-3:][::-1] if m not in improvements]
    if improvements:
        print("top cpu improvements:")
        for q, r in improvements:
            print(f"  {q}: {r:.2f}x  ({old['cpu'][q]:.2f}s -> {new['cpu'][q]:.2f}s)")
    if regressions:
        print("top cpu regressions:")
        for q, r in regressions:
            print(f"  {q}: {r:.2f}x  ({old['cpu'][q]:.2f}s -> {new['cpu'][q]:.2f}s)")
    if only_new:
        added_wall = sum(new["queries"][q] for q in only_new)
        print(f"new queries ({added_wall:.2f}s wall): {', '.join(only_new)}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
