#!/usr/bin/env python3
"""Per-query round-over-round bench diff.

Joins the per-query timing maps of two BENCH_r*.json files and prints the
queries that moved by more than a threshold factor (default 1.5x) in either
direction, so a driver-visible regression is triaged per query instead of by
the (noise-prone) headline total.

Usage:
    python3 scripts/bench_diff.py BENCH_r07.json BENCH_r08.json [--threshold 1.5]

Each input may be either the raw driver file (one JSON object, possibly with
surrounding text) or a bare metric line; the script extracts the first
'{"metric":...}' object it finds.
"""
import argparse
import json
import re
import sys


def load_bench(path):
    with open(path) as f:
        text = f.read()
    # driver files wrap the metric line in a {"tail": "..."} envelope with
    # escaped quotes — decode the envelope first if present
    try:
        outer = json.loads(text)
        if isinstance(outer, dict) and "tail" in outer:
            text = outer["tail"]
        elif isinstance(outer, dict) and "queries" in outer:
            return {q: t for q, t in outer["queries"].items()
                    if isinstance(t, (int, float)) and t > 0}
    except json.JSONDecodeError:
        pass
    # the metric object may be embedded in captured stdout — find it
    m = re.search(r'\{"metric".*\}', text)
    if not m:
        sys.exit(f"{path}: no metric JSON object found")
    obj = json.loads(m.group(0))
    queries = obj.get("queries") or {}
    if not queries:
        sys.exit(f"{path}: metric object has no per-query map")
    # drop failed queries (recorded as -1)
    return {q: t for q, t in queries.items() if isinstance(t, (int, float)) and t > 0}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="report queries whose time moved by more than this factor")
    args = ap.parse_args()

    old, new = load_bench(args.old), load_bench(args.new)
    common = sorted(set(old) & set(new))
    movers = []
    for q in common:
        ratio = new[q] / old[q]
        if ratio > args.threshold or ratio < 1 / args.threshold:
            movers.append((ratio, q))
    movers.sort(reverse=True)

    print(f"{len(common)} common queries; "
          f"total {sum(old[q] for q in common):.2f}s -> {sum(new[q] for q in common):.2f}s")
    for only, name in ((set(new) - set(old), "new"), (set(old) - set(new), "removed")):
        if only:
            print(f"{name} queries: {', '.join(sorted(only))}")
    if not movers:
        print(f"no query moved more than {args.threshold}x")
        return
    print(f"\nmovers (> {args.threshold}x either way), slowest-regression first:")
    for ratio, q in movers:
        print(f"  {q:<12} {old[q]:8.2f}s -> {new[q]:8.2f}s  ({ratio:5.2f}x)")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        sys.exit(0)
