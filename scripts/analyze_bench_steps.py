"""Classify per-step outliers from a bench.py run log (VERDICT r4 weak #2).

bench.py emits {"per_step": [[step, group, wall_s, emitted], ...]} on stderr
for every measured walk.  This reads a saved log and, per walk, reports:
  * group median / min / max and the steps beyond 1.25x group median
  * whether outliers correlate with chunk EMIT steps (VAE-boundary /
    cache-roll work rides on those), the first step of each group
    (late compile / variant switch), or neither (host jitter)

Usage: python scripts/analyze_bench_steps.py /tmp/bench_r5_run3.log
"""

import json
import sys
from collections import defaultdict


def analyze(records, walk_idx):
    groups = defaultdict(list)
    for step, grp, dt, emitted in records:
        groups[grp].append((step, dt, emitted))
    print(f"\n=== walk {walk_idx}: {len(records)} steps ===")
    first_of_group = {g: min(s for s, _, _ in v) for g, v in groups.items()}
    for g, v in sorted(groups.items()):
        times = sorted(dt for _, dt, _ in v)
        med = times[len(times) // 2]
        outs = [(s, dt, em) for s, dt, em in v if dt > 1.25 * med]
        print(f"  {g}: n={len(v)} med={med:.3f} min={times[0]:.3f} max={times[-1]:.3f}"
              f" spread={times[-1]/max(times[0],1e-9):.2f}x")
        for s, dt, em in outs:
            tags = []
            if em:
                tags.append("EMIT")
            if s == first_of_group[g]:
                tags.append("FIRST-OF-GROUP")
            prev = next((r for r in records if r[0] == s - 1), None)
            if prev is not None and prev[3]:
                tags.append("AFTER-EMIT")
            print(f"    outlier step {s}: {dt:.3f}s ({dt/med:.2f}x med) "
                  f"{' '.join(tags) or 'no-tag'}")
    # correlation summary
    all_outs = []
    for g, v in groups.items():
        times = sorted(dt for _, dt, _ in v)
        med = times[len(times) // 2]
        all_outs += [(s, dt, em, g, med) for s, dt, em in v if dt > 1.25 * med]
    if all_outs:
        n_emit = sum(1 for s, dt, em, g, m in all_outs if em)
        n_after = sum(
            1 for s, dt, em, g, m in all_outs
            if any(r[0] == s - 1 and r[3] for r in records)
        )
        n_first = sum(
            1 for s, dt, em, g, m in all_outs if s == first_of_group[g]
        )
        excess = sum(dt - m for s, dt, em, g, m in all_outs)
        total = sum(dt for _, _, dt, _ in [(0, 0, r[2], 0) for r in records])
        print(f"  -> {len(all_outs)} outliers: {n_emit} on EMIT steps, "
              f"{n_after} right after an emit, {n_first} first-of-group; "
              f"excess-over-median {excess:.1f}s of {total:.1f}s total "
              f"({100*excess/max(total,1e-9):.1f}%)")
    else:
        print("  -> no outliers beyond 1.25x group median")


def main():
    path = sys.argv[1]
    walk = 0
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "per_step" in d:
            walk += 1
            analyze(d["per_step"], walk)


if __name__ == "__main__":
    main()
