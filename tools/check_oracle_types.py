#!/usr/bin/env python3
"""Oracle type audit (dev/test tool, driver-side python only).

DESCRIBE each oracle query in DuckDB and flag result columns whose
DuckDB type pandas rehydrates as a DIFFERENT dtype than the equal-value
Spark column — the silent hash-killers:

  - HUGEINT / UHUGEINT (DuckDB's integer sum() result): pandas converts
    to float64, so `270` hashes differently from Spark's long `270`
    (bit q66 in round 5 — rows and schema matched, every value equal).
  - DECIMAL (any bare numeric literal arithmetic): pandas materializes
    Decimal objects or floats; Spark emits double — last-ulp drift.

DESCRIBE only plans, never executes, so the audit is O(#oracles) fast
and independent of scale factor.

Usage: check_oracle_types.py SF_DIR ORACLE_SQL_JSON
Exit 0 = clean; exit 1 prints one TYPE_TRAP line per offending column.
"""
import json
import sys

import duckdb

BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main():
    sf_dir, sql_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(sql_json) as f:
        oracles = json.load(f)
    traps = []
    for name, sql in sorted(oracles.items()):
        try:
            cols = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # an unplannable oracle is itself a trap
            traps.append((name, "<describe failed>", str(e).splitlines()[0]))
            continue
        for col in cols:
            col_name, col_type = col[0], col[1]
            if any(b in col_type for b in BAD_TYPES):
                traps.append((name, col_name, col_type))
    for name, col_name, col_type in traps:
        print(f"TYPE_TRAP {name}.{col_name}: {col_type}")
    print(f"{len(oracles)} oracles audited, {len(traps)} type traps")
    sys.exit(1 if traps else 0)


if __name__ == "__main__":
    main()
