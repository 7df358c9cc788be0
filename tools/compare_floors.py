#!/usr/bin/env python3
"""Compare a fresh bench report against an archived floor report.

Usage: compare_floors.py <new_report.json> <floor_report.json> [bound]

Prints every query whose new time exceeds bound x floor (default 1.3 —
the BENCH_NOISE.md noise bound), sorted by ratio, plus totals. Queries
present only in the new report are listed as NEW.
"""
import json
import sys


def main() -> None:
    new_path, floor_path = sys.argv[1], sys.argv[2]
    bound = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    new = json.load(open(new_path))["queries"]
    floor = json.load(open(floor_path))["queries"]
    over = []
    for q, t in new.items():
        if q not in floor:
            print(f"NEW      {q}: {t:.2f}s (no floor)")
            continue
        r = t / floor[q] if floor[q] > 0 else float("inf")
        if r > bound:
            over.append((r, q, t, floor[q]))
    for r, q, t, f in sorted(over, reverse=True):
        print(f"OVER {r:5.2f}x  {q}: {t:.2f}s vs floor {f:.2f}s")
    shared = [q for q in new if q in floor]
    tn = sum(new[q] for q in shared)
    tf = sum(floor[q] for q in shared)
    print(f"\nshared {len(shared)} queries: new {tn:.1f}s vs floor {tf:.1f}s "
          f"({tn / tf:.2f}x); {len(over)} over the {bound}x bound")


if __name__ == "__main__":
    main()
