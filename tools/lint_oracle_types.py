#!/usr/bin/env python3
"""Static type lint over every oracle SQL in SparkEntry.oracleSql.

Round-9 root cause: DuckDB types uncast integer arithmetic
((SUM(x)*1000000) // y, windowed SUM over ints) as HUGEINT (int128),
which Spark cannot emit, so the driver's typed hash fails even when all
values are equal. This lint catches the whole class WITHOUT needing a
Spark Verify run: it DESCRIBEs each oracle SQL in DuckDB against the
fixture tables and fails on any output column whose type Spark cannot
produce (HUGEINT and friends), or that this engine never emits
(DECIMAL, unsigned ints, TIME, INTERVAL, ...).

This is the fast static half of the gate; tools/check_oracle.py's
type_drift() is the authoritative half (compares against the actual
Spark parquet schema, so it also catches BIGINT-vs-INTEGER and
FLOAT-vs-DOUBLE drift that needs both sides to detect).

Usage: lint_oracle_types.py <sfDir> <oracle_sql.json | verifyOutDir>
Exit 0 = clean, 1 = drift found, 2 = usage/infra error.
"""
import json
import os
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Type names (as substrings of DuckDB's type string, incl. inside
# LIST/STRUCT) that Spark either cannot represent or this engine never
# emits. Word-boundary matched so BIGINT doesn't trip on HUGEINT's
# absence etc.
BANNED = ["HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
          "UBIGINT", "DECIMAL", "TIME", "INTERVAL", "BIT", "UUID",
          "ENUM", "UNION"]
# TIMESTAMP contains no banned word; "TIME" must not match inside
# "TIMESTAMP", so use boundaries.
BANNED_RE = re.compile(r"\b(" + "|".join(BANNED) + r")\b")


def banned_hits(type_str):
    s = str(type_str).upper().replace("TIMESTAMP WITH TIME ZONE",
                                      "TIMESTAMPTZOK")
    s = re.sub(r"TIMESTAMP(_\w+)?", "TSOK", s)  # strip TIMESTAMP variants
    return sorted(set(BANNED_RE.findall(s)))


def main(sf_dir, oracle_path):
    if os.path.isdir(oracle_path):
        oracle_path = os.path.join(oracle_path, "oracle_sql.json")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    failures = []
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            cols = list(zip(rel.columns, rel.types))
        except Exception as e:
            failures.append((name, f"oracle SQL failed to plan: {e}"))
            continue
        for c, t in cols:
            hits = banned_hits(t)
            if hits:
                failures.append(
                    (name, f"column {c} typed {t} — Spark-unrepresentable "
                           f"({', '.join(hits)}); add a CAST in the oracle"))
    for name, msg in failures:
        print(f"  FAIL {name}: {msg}")
    print(f"{len(oracle) - len({n for n, _ in failures})}/{len(oracle)} "
          f"oracle SQLs type-clean")
    return 1 if failures else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
