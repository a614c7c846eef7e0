#!/usr/bin/env python3
"""Calibration-normalized bench comparison (dev aid).

    python3 tools/benchdiff.py <old_bench_out.json> <new_bench_out.json>
    python3 tools/benchdiff.py <git-ref> <new_bench_out.json>   # ref:bench_out.json

Both files must be full Bench outputs at the SAME sf dir. When both carry
calib_sec_* (r14+), per-query min-of-reps ratios are also shown normalized
by the host-speed ratio, so a uniform epoch shift (the r13->r14 lesson)
reads as ~1.0x instead of a fleet of false regressions. Rows are flagged
only when the NORMALIZED min ratio exceeds the threshold (default 1.5).
"""
import json
import subprocess
import sys


def load(src):
    try:
        with open(src) as f:
            return json.load(f)
    except (FileNotFoundError, IsADirectoryError):
        out = subprocess.check_output(
            ["git", "show", f"{src}:bench_out.json"])
        return json.loads(out)


def calib(d, par=False):
    pre = "calib_par_sec" if par else "calib_sec"
    vals = [d[k] for k in (f"{pre}_before", f"{pre}_after")
            if k in d and d[k] > 0]
    return sum(vals) / len(vals) if vals else None


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    if old.get("sf") != new.get("sf"):
        sys.exit(f"sf mismatch: {old.get('sf')} vs {new.get('sf')}")
    # memo regime must match (ADVICE r14): comparing a cold
    # (SPARK_GRAFT_MEMO_BYPASS) run against a memo-warm baseline flags
    # every memoized row 3-10x and calibration cannot tell the regimes
    # apart. Files without the field (pre-r15) are memo-warm.
    ro, rn = old.get("memo_bypass", False), new.get("memo_bypass", False)
    if ro != rn:
        sys.exit(f"memo regime mismatch: old memo_bypass={ro} vs "
                 f"new memo_bypass={rn} — compare like with like "
                 "(re-run one side in the other's regime)")
    co, cn = calib(old), calib(new)
    cpo, cpn = calib(old, par=True), calib(new, par=True)
    # the all-core calibration (r15) sees contention epochs the
    # single-thread walk cannot (SMT/memory-bandwidth co-tenancy slows
    # 32-way work while a lone thread stays flat — the r15 close
    # lesson); prefer it for normalization when both sides carry it
    host1 = (cn / co) if (co and cn) else None
    hostp = (cpn / cpo) if (cpo and cpn) else None
    host = hostp or host1
    print(f"total med {old['value']:.1f} -> {new['value']:.1f}  "
          f"min {old.get('total_min', 0):.1f} -> "
          f"{new.get('total_min', 0):.1f}")
    if host:
        which = "all-core" if hostp else "single-core"
        extra = (f" (single-core ratio {host1:.3f})"
                 if hostp and host1 else "")
        print(f"host-speed ratio ({which} calib, new/old): {host:.3f}"
              f"{extra} — normalized ratios divide by this")
    else:
        print("calib missing on one side — raw ratios only")
    common = sorted(set(old["queries_min"]) & set(new["queries_min"]))
    flagged = []
    for k in common:
        a, b = old["queries_min"][k], new["queries_min"][k]
        if a <= 0:
            continue
        raw = b / a
        norm = raw / host if host else raw
        if norm > thresh:
            flagged.append((norm, raw, k, a, b))
    dropped = sorted(set(old["queries_min"]) - set(new["queries_min"]))
    added = sorted(set(new["queries_min"]) - set(old["queries_min"]))
    if flagged:
        print(f"\n{len(flagged)} queries over {thresh}x normalized min:")
        for norm, raw, k, a, b in sorted(flagged, reverse=True):
            print(f"  {k:32s} {a:7.3f} -> {b:7.3f}  "
                  f"raw {raw:4.2f}x  norm {norm:4.2f}x")
    else:
        print(f"\nno query over {thresh}x normalized min "
              f"({len(common)} compared)")
    if dropped:
        print(f"dropped from new: {', '.join(dropped)}")
    if added:
        print(f"new queries: {', '.join(added)}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
