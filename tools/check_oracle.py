#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only,
not part of the library): reads Verify.scala's output directory, runs
each oracle_sql.json query in DuckDB over the same testdata parquet, and
compares result sets (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # columns sorted by name, rows sorted by full tuple
    df = df[sorted(df.columns)]
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr), list(df.columns)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet({files!r})").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        s_rows, s_cols = canon(spark_df)
        d_rows, d_cols = canon(duck_df)
        if s_cols != d_cols:
            results[name] = f"SCHEMA_MISMATCH spark={s_cols} duck={d_cols}"
        elif len(s_rows) != len(d_rows):
            results[name] = f"ROWCOUNT {len(s_rows)} vs {len(d_rows)}"
        elif s_rows != d_rows:
            # The driver's gate is EXACT hash equality; this dev stand-in
            # additionally reports whether a mismatch is only last-ulp
            # float drift (engines disagreeing in the final bit of a
            # double) so that class of failure is diagnosable at a glance.
            import math

            def close(a, b):
                if isinstance(a, float) and isinstance(b, float):
                    return (a == b or (math.isnan(a) and math.isnan(b))
                            or math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12))
                return a == b or repr(a) == repr(b)

            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            ulp_only = all(
                len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
                for a, b in diffs)
            tag = "FLOAT_ULP_DRIFT (exact hash would still fail)" if ulp_only \
                else "VALUE_MISMATCH"
            results[name] = f"{tag} {len(diffs)} rows, first: {diffs[0] if diffs else '?'}"
        else:
            results[name] = "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        flag = "  " if v == "OK" else "->"
        print(f"{flag} {name}: {v}")
    print(f"\n{n_ok}/{len(results)} oracle-checked queries match")
    # rows-only queries (registered but no oracle)
    import os
    all_q = [os.path.basename(p) for p in glob.glob(f"{out_dir}/q*") if os.path.isdir(p)]
    rows_only = sorted(set(all_q) - set(oracle))
    for name in rows_only:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if files:
            n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            print(f"   rows-only {name}: {n} rows")
        else:
            print(f"-> rows-only {name}: MISSING OUTPUT")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
