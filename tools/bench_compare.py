#!/usr/bin/env python3
"""Compare two Bench JSON lines: per-query ratios, sorted by regression.

Usage: bench_compare.py OLD.json NEW.json [threshold]
Prints queries whose NEW/OLD ratio exceeds the threshold (default 1.5),
then the five biggest improvements. Exits 0 always (informational).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    ratios = [(nq[k] / oq[k] if oq[k] > 0 else float("inf"), k) for k in shared]
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s  "
          f"({len(shared)} shared, {len(set(nq) - set(oq))} new arms)")
    regs = [(r, k) for r, k in ratios if r > thresh]
    for r, k in sorted(regs, reverse=True):
        print(f"  REG {k:32s} {oq[k]:7.2f} -> {nq[k]:7.2f}  ({r:.2f}x)")
    if not regs:
        print(f"  no query regressed past {thresh}x")
    for r, k in sorted(ratios)[:5]:
        print(f"  imp {k:32s} {oq[k]:7.2f} -> {nq[k]:7.2f}  ({r:.2f}x)")
    for k in sorted(set(nq) - set(oq)):
        print(f"  new {k:32s}            {nq[k]:7.2f}")


if __name__ == "__main__":
    main()
