#!/usr/bin/env python3
"""Local oracle-parity harness (mimics the driver's CORRECTNESS check).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s tables,
sorts columns by name and rows by all columns, and compares values.
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(r):
        out = []
        for i in order:
            v = r[i]
            out.append((v is None, str(type(v)), str(v)))
        return out

    return sorted([tuple(r[i] for i in order) for r in rows], key=lambda r: [
        (v is None, str(v)) for v in r])


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb
    return a == b


def types_of(con, query):
    """Column-name -> DuckDB type-name map via DESCRIBE (catches the
    HUGEINT-vs-BIGINT / DECIMAL-width seams the driver's type-sensitive
    hash flags but value comparison cannot)."""
    rows = con.execute(f"DESCRIBE {query}").fetchall()
    return {r[0]: r[1] for r in rows}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            d_cols = [d[0] for d in duck_rel.description]
            d_rows = duck_rel.fetchall()
            s_types = types_of(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            d_types = types_of(con, f"({sql})")
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1
            continue
        type_bad = [(c, s_types.get(c), d_types.get(c)) for c in sorted(s_cols)
                    if s_types.get(c) != d_types.get(c)]
        if type_bad:
            print(f"FAIL {name}: type seam {type_bad}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        sc, dc = canon(s_rows, s_cols), canon(d_rows, d_cols)
        bad = None
        for i, (a, b) in enumerate(zip(sc, dc)):
            if not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
