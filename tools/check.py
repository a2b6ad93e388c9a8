#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same fixture dir, compare
row counts, sorted-column schemas and sorted-row values. Dev tool only —
not part of the shipped library."""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("NaN")
                else:
                    norm.append(round(v, 9))
            elif hasattr(v, "timestamp"):  # datetime
                norm.append(str(v))
            else:
                norm.append(v)
        out.append(tuple(norm))
    return sorted(out, key=repr)


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = out / name
        if not qdir.exists():
            print(f"FAIL {name}: spark output missing")
            n_fail += 1
            continue
        try:
            spark_rel = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.execute(oracle[name])
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # align column order by name
        sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s = normalize([tuple(r[i] for i in sidx) for r in spark_rows])
        d = normalize([tuple(r[i] for i in didx) for r in duck_rows])
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
        elif s != d:
            diff = next(i for i, (a, b) in enumerate(zip(s, d)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {diff}:\n  spark={s[diff]}\n  duck ={d[diff]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} oracle queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
