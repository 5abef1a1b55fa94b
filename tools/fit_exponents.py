#!/usr/bin/env python3
"""Fit per-query scale exponents from two Bench full-map JSONs.

Usage: python3 tools/fit_exponents.py <bench_1x.json> <bench_10x.json> [scale]

Reads the {"queries": {...}} maps produced by graft.Bench
(SPARK_GRAFT_BENCH_OUT), computes e = log(t_Nx / t_1x) / log(N) per
query (N = scale, default 10), and prints a markdown table sorted by
exponent descending. Queries missing from either map, or with
non-positive walls (errored runs time as ~0), are listed separately.

Dev tooling only (scale probes) — not part of the shipped library.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows, skipped = [], []
    for q in sorted(a):
        if q not in b or a[q] <= 0 or b[q] <= 0:
            skipped.append(q)
            continue
        rows.append((q, a[q], b[q], math.log(b[q] / a[q]) / math.log(scale)))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | 1x (s) | {scale:g}x (s) | e(1->{scale:g}) |")
    print("|---|---|---|---|")
    for q, t1, tn, e in rows:
        print(f"| {q} | {t1:.2f} | {tn:.2f} | {e:.2f} |")
    total1 = sum(a[q] for q, *_ in [(r[0],) for r in rows])
    totaln = sum(b[r[0]] for r in rows)
    print(f"\ntotals over {len(rows)} shared queries: "
          f"{total1:.1f} s -> {totaln:.1f} s "
          f"(e = {math.log(totaln / total1) / math.log(scale):.2f})")
    if skipped:
        print(f"skipped (missing/errored): {', '.join(skipped)}")


if __name__ == "__main__":
    main()
