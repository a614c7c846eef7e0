#!/usr/bin/env python3
"""Scale-stress ratio table (SURVEY §6, r15 VERDICT task 1).

    python3 tools/scalediff.py <bench_1x.json> <bench_Kx.json> [K]

Both files are Bench outputs over the SAME query set, the second on a
ScaleFixture K-times replica (default K=10). Prints t(Kx)/t(1x) per
query from the min-of-reps floor (the contention-immune number) and
flags rows whose ratio exceeds 2*K — super-linear beyond slack, the
"name a fix or attribute it" bar. Rows faster than 0.2s at 1x are
annotated: their ratios are fixed-overhead-dominated, not data slope.
"""
import json
import sys


def main():
    with open(sys.argv[1]) as f:
        one = json.load(f)
    with open(sys.argv[2]) as f:
        big = json.load(f)
    k = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    if one.get("memo_bypass") != big.get("memo_bypass"):
        sys.exit("memo regime mismatch between the two runs")
    rows = sorted(set(one["queries_min"]) & set(big["queries_min"]))
    print(f"{'query':34s} {'1x_min':>8s} {'Kx_min':>8s} {'ratio':>7s}")
    flagged = []
    for q in rows:
        a, b = one["queries_min"][q], big["queries_min"][q]
        r = b / a if a > 0 else float("inf")
        note = ""
        if a < 0.2:
            note = "  (sub-0.2s base: overhead-dominated)"
        if r > 2 * k:
            note += "  ** SUPER-LINEAR"
            flagged.append(q)
        print(f"{q:34s} {a:8.3f} {b:8.3f} {r:6.2f}x{note}")
    ta, tb = one.get("total_min", 0), big.get("total_min", 0)
    print(f"{'TOTAL':34s} {ta:8.3f} {tb:8.3f} "
          f"{(tb / ta if ta else 0):6.2f}x")
    if flagged:
        print(f"\nsuper-linear (> {2 * k:.0f}x): {', '.join(flagged)}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
