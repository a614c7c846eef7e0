#!/usr/bin/env python3
"""Subset-aware wrapper over tools/check.py for dev runs that dump only a
few queries via SPARK_GRAFT_VERIFY_ONLY: reports OK/FAIL for queries whose
parquet dump EXISTS in <outDir> and ignores the (expected) missing rest.

    python3 tools/subcheck.py <sfDir> <outDir>
"""
import io, os, sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    dumped = sorted(
        n for n in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, n)))
    buf = io.StringIO()
    sys.argv = ["check.py", sf_dir, out_dir]
    with redirect_stdout(buf):
        try:
            check.main()
        except SystemExit:
            pass
    lines = buf.getvalue().splitlines()
    ok, fail = set(), {}
    for ln in lines:
        parts = ln.split(None, 2)
        if len(parts) < 2 or parts[0] not in ("ok", "FAIL"):
            continue
        status, name = parts[0], parts[1].rstrip(":")
        rest = parts[2] if len(parts) > 2 else ""
        if status == "ok":
            ok.add(name)
        else:
            fail[name] = rest
    bad = 0
    for n in dumped:
        if n in ok:
            print(f"OK   {n}")
        else:
            bad += 1
            print(f"FAIL {n}: {fail.get(n, 'no verdict from check.py')}")
    print(f"== subset {len(dumped) - bad}/{len(dumped)} matched")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
