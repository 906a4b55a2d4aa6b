#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same testdata tables, and
compare (columns sorted by name, rows sorted, values canonicalized).

Dev tool only — the engine itself is pure Scala/Spark.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision (shortest round-trip repr): a 9-sig-digit canon
        # hides ulp-level engine differences that the driver's hash catches
        return repr(v)
    return str(v)


def rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_cols = [d[0] for d in con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description]
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            failures += 1
            continue
        try:
            # Type lint first: fetchall() converts HUGEINT/DECIMAL to exact
            # Python values, but the driver's pandas path converts them to
            # float64 ("1" -> "1.0") — a hash mismatch this gate would
            # otherwise never see (the round-2/3 q54 red: an uncast DuckDB
            # window sum(int) is HUGEINT). Oracles must emit only
            # BIGINT/INT/DOUBLE/VARCHAR/BOOL/DATE/TIMESTAMP columns.
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
            hazards = [(c, ty) for c, ty, *_ in desc
                       if ty.upper().startswith(("HUGEINT", "UHUGEINT",
                                                 "DECIMAL", "UBIGINT"))]
            if hazards:
                print(f"FAIL {name}: pandas-lossy oracle column types "
                      f"{hazards} — cast to ::BIGINT/::DOUBLE")
                failures += 1
                continue
            res = con.execute(sql)
            want_cols = [d[0] for d in res.description]
            want = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            failures += 1
            continue
        g, w = rowset(got, got_cols), rowset(want, want_cols)
        if g != w:
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    print(f"  first diff at {i}:\n    spark={a}\n    duck ={b}")
                    break
            if len(g) != len(w):
                only_g = [r for r in g if r not in w][:2]
                only_w = [r for r in w if r not in g][:2]
                print(f"  only-spark: {only_g}\n  only-duck : {only_w}")
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
