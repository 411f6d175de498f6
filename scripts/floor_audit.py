#!/usr/bin/env python3
"""Floor audit (r14): compare BASELINE_local.json frozen mins against one
or more bench artifacts (bench_local.json-style 'queries_min' maps) plus
the driver's BENCH_r13 evidence, and list every floor the measured runs
cannot reproduce inside the regression gate (1.5x + 0.25 s, de-drifted by
the fleet-median ratio, mirroring graft.Bench.regressions)."""
import json
import statistics
import sys


def load_min(path):
    data = json.load(open(path))
    if "parsed" in data:
        data = data["parsed"]
    return data["queries_min"], data.get("drift")


def drift_factor(base, cur):
    ratios = sorted(cur[k] / base[k] for k in cur
                    if k in base and base[k] > 0 and cur[k] >= 0)
    if len(ratios) < 8:
        return 1.0
    return max(1.0, statistics.median(ratios))


def main():
    base = json.load(open("BASELINE_local.json"))["queries_min"]
    runs = []
    for path in sys.argv[1:]:
        cur, _ = load_min(path)
        runs.append((path, cur, drift_factor(base, cur)))
    rows = []
    for name, frozen in base.items():
        worst = []
        for path, cur, drift in runs:
            if name not in cur or cur[name] < 0:
                continue
            adj = cur[name] / drift
            flagged = adj > frozen * 1.5 and adj - frozen > 0.25
            worst.append((adj, cur[name], flagged, path))
        if not worst:
            continue
        best_adj = min(w[0] for w in worst)
        flagged_everywhere = all(w[2] for w in worst)
        if flagged_everywhere or best_adj / frozen > 1.35:
            rows.append((best_adj / frozen, name, frozen, best_adj,
                         flagged_everywhere))
    rows.sort(reverse=True)
    print(f"{'ratio':>6} {'entry':<30} {'frozen':>7} {'best_adj':>9} gate")
    for r, name, frozen, adj, fl in rows:
        print(f"{r:6.2f} {name:<30} {frozen:7.3f} {adj:9.3f} "
              f"{'OUTSIDE' if fl else 'near'}")
    for path, _, drift in runs:
        print(f"# drift {drift:.3f}  {path}")


if __name__ == "__main__":
    main()
