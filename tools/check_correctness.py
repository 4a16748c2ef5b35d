#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [query ...]

Optional trailing query names restrict the check to those oracle rows
(fast single-query iteration; the full gate is the no-filter run).

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
tables, and compares row counts, column names, and per-column value
multisets (sorted stringified values — order-independent).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v!r}"
    return str(v)


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        missing = [q for q in only if q not in oracle]
        if missing:
            print(f"FAIL no oracle row for: {missing}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in only}
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            duck_cols = [c.lower() for c in duck_rel.columns]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            bad.append((name, f"EXEC: {str(e)[:200]}"))
            continue
        # The driver canonicalizes HUGEINT through float ("4869565.0"),
        # so an uncast DuckDB integer sum hash-mismatches a value-equal
        # Spark int64 column (bit us on q_c81 in r11). Fail loudly here
        # instead of silently fetching the Python int.
        wide = [c for c, t in zip(duck_rel.columns, duck_rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT")]
        if wide:
            bad.append((name, f"ORACLE-TYPE: HUGEINT output column(s) {wide}"
                              " — CAST to BIGINT in the oracle SQL"))
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            bad.append((name, f"SCHEMA: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"))
            continue
        if len(spark_rows) != len(duck_rows):
            bad.append((name, f"ROWS: spark={len(spark_rows)} duck={len(duck_rows)}"))
            continue
        mismatch = None
        for col in spark_cols:
            si = spark_cols.index(col)
            di = duck_cols.index(col)
            sv = sorted(canon(r[si]) for r in spark_rows)
            dv = sorted(canon(r[di]) for r in duck_rows)
            if sv != dv:
                diffs = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
                mismatch = f"VALUES[{col}]: {diffs}"
                break
        if mismatch:
            bad.append((name, mismatch))
        else:
            ok.append(name)
    print(f"PASS {len(ok)}/{len(ok) + len(bad)}: {' '.join(ok)}")
    for name, why in bad:
        print(f"FAIL {name}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
