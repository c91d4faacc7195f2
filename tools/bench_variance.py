#!/usr/bin/env python3
"""Per-family bench variance table from N bench JSON artifacts.

Usage: bench_variance.py run1.json run2.json [...] — prints a markdown
table of per-family total seconds per run, plus mean and spread
(max-min as a percentage of the mean). Families are name prefixes up to
the first underscore, except the multi-segment families that read
better whole (src_snapshot, src_connector).
"""
import json
import sys
from collections import defaultdict


def family(name: str) -> str:
    for p in ("src_snapshot", "src_connector", "pipeline", "stream",
              "neardup", "dedup", "simsearch", "multimodal", "text",
              "events", "graph", "agg", "join", "sample", "audit",
              "governance", "approx", "embed", "window", "layout",
              "src", "sql", "scalar", "set", "q"):
        if name == p or name.startswith(p + "_") or \
                (p == "q" and name[0] == "q" and name[1].isdigit()):
            return p
    return "other"


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        runs.append(doc["queries"])
        # Machine-state markers (emitted by graft.Bench since r17) make
        # ambient-load drift attributable from the artifact alone.
        m = doc.get("machine")
        if m:
            print(f"-- {p}: load1 {m.get('load1_start')} -> "
                  f"{m.get('load1_end')}, jvms {m.get('jvms')}, "
                  f"uptime {m.get('jvm_uptime_sec')}s, "
                  f"seed {m.get('order_seed')}")
    common = set(runs[0])
    for r in runs[1:]:
        common &= set(r)
    fams = defaultdict(lambda: [0.0] * len(runs))
    for q in sorted(common):
        f = family(q)
        for i, r in enumerate(runs):
            fams[f][i] += r[q]
    hdr = "| family | " + " | ".join(
        f"run{i + 1} (s)" for i in range(len(runs))) + \
        " | mean (s) | spread |"
    print(hdr)
    print("|" + "---|" * (len(runs) + 3))
    rows = sorted(fams.items(), key=lambda kv: -sum(kv[1]))
    tot = [0.0] * len(runs)
    for f, vals in rows:
        for i, v in enumerate(vals):
            tot[i] += v
        mean = sum(vals) / len(vals)
        spread = (max(vals) - min(vals)) / mean * 100 if mean else 0.0
        cells = " | ".join(f"{v:.1f}" for v in vals)
        print(f"| {f} | {cells} | {mean:.1f} | {spread:.0f}% |")
    mean = sum(tot) / len(tot)
    spread = (max(tot) - min(tot)) / mean * 100 if mean else 0.0
    cells = " | ".join(f"{v:.1f}" for v in tot)
    print(f"| **total** | {cells} | {mean:.1f} | {spread:.0f}% |")
    # Largest per-query swings across runs, for attribution.
    swings = []
    for q in common:
        vals = [r[q] for r in runs]
        if max(vals) >= 0.5:
            swings.append((max(vals) - min(vals), q, vals))
    swings.sort(reverse=True)
    print()
    print("Largest per-query swings (max-min, queries ≥0.5s):")
    for d, q, vals in swings[:10]:
        print(f"- {q}: " + " / ".join(f"{v:.2f}" for v in vals) +
              f"  (Δ{d:.2f}s)")


if __name__ == "__main__":
    main(sys.argv[1:])
