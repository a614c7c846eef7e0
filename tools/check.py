#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (dev aid only; the
library itself has no Python dependency). Usage:

    python3 tools/check.py <sfDir> <outDir>

Reads <outDir>/<name>/*.parquet (written by graft.Verify) and compares each
against its oracle SQL from <outDir>/oracle_sql.json run in DuckDB over the
fixture tables in <sfDir>. Columns sorted by name; rows compared in order.

Values are compared via CANONICAL STRINGS to mirror the driver's hash gate
(str(Decimal) keeps trailing scale zeros, repr(float) is shortest-repr —
so DECIMAL('1524135.00') != float 1524135.0, exactly as the driver sees
it). A Decimal-vs-float column pairing is reported as a TYPE failure even
when the strings happen to match, because it diverges whenever a value has
a trailing zero in its last scale digit."""
import duckdb, json, sys, math
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(x):
    """Canonical string form mirroring the driver's normalization: ints of
    any width agree; floats use shortest repr; Decimals keep their scale."""
    if x is None:
        return "∅"
    if isinstance(x, float):
        return "nan" if math.isnan(x) else repr(x)
    if isinstance(x, bool):
        return str(x)
    if isinstance(x, (int, Decimal)):
        return str(x)
    if isinstance(x, list):
        return "[" + ",".join(canon(v) for v in x) + "]"
    if isinstance(x, dict):
        return "{" + ",".join(f"{k}:{canon(v)}" for k, v in sorted(x.items())) + "}"
    return repr(x)

def tclass(x):
    if isinstance(x, bool):
        return "bool"
    if isinstance(x, int):
        return "int"
    if isinstance(x, float):
        return "float"
    if isinstance(x, Decimal):
        return "decimal"
    return type(x).__name__

def veq(a, b):
    # numeric type-class divergence (decimal vs float/int) is a latent
    # driver-hash failure even if this particular value stringifies equal
    if a is not None and b is not None and \
       {tclass(a), tclass(b)} in ({"decimal", "float"}, {"decimal", "int"},
                                  {"float", "int"}):
        return False
    return canon(a) == canon(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    fails, ok = [], 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp_cols = [d[0] for d in con.execute(sql).description]
            exp = con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            fails.append(name); continue
        try:
            q = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            got_cols = [d[0] for d in con.execute(q).description]
            got = con.execute(q).fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e).splitlines()[0]}")
            fails.append(name); continue
        eperm = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if [exp_cols[i] for i in eperm] != [got_cols[i] for i in gperm]:
            print(f"FAIL {name}: columns exp={sorted(exp_cols)} got={sorted(got_cols)}")
            fails.append(name); continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails.append(name); continue
        bad = None
        for r, (er, gr) in enumerate(zip(exp, got)):
            for ei, gi in zip(eperm, gperm):
                if not veq(er[ei], gr[gi]):
                    bad = (r, exp_cols[ei], er[ei], gr[gi])
                    break
            if bad:
                break
        if bad:
            r, c, e, g = bad
            print(f"FAIL {name}: row {r} col {c}: oracle={e!r} spark={g!r}")
            fails.append(name)
        else:
            ok += 1
            print(f"ok   {name} ({len(exp)} rows)")
    print(f"== {ok}/{len(oracle)} matched; failed: {fails if fails else 'none'}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
