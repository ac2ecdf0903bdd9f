#!/usr/bin/env python3
"""Oracle-output TYPE lint: DESCRIBE every SparkEntry.oracleSql through
DuckDB and fail on any output column typed HUGEINT/UHUGEINT/DECIMAL.

Spark never emits those types, so any occurrence means the driver's
type-sensitive canonicalization (Arrow -> pandas, where HUGEINT becomes
decimal128/float64 and stringifies differently from Spark's BIGINT) will
hash-red the query even when every value is equal — the exact mechanism
behind the r14 (4 rows) and r15 (6 rows) CORRECTNESS failures. DuckDB
widens sum(BIGINT) and sum(BIGINT) OVER to HUGEINT and types bare decimal
literals (0.5) as DECIMAL(2,1): CAST them back (AS BIGINT / AS DOUBLE) at
the emission site.

DESCRIBE binds but does not execute, so this lints all ~356 queries in
seconds. Usage: lint_oracle_types.py <sfDir> <oracle_sql.json>
"""
import sys, json, os, re
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

# Unsigned widths (e.g. regr_count -> UINTEGER) stringify the same for
# in-range values but are one widening away from the HUGEINT class, so
# the whole unsigned family is banned too: cast to BIGINT at the source.
BAD = re.compile(r"HUGEINT|DECIMAL|UTINYINT|USMALLINT|UINTEGER|UBIGINT",
                 re.IGNORECASE)
oracle = json.load(open(oracle_path))
fails = 0
for name in sorted(oracle):
    try:
        desc = con.sql(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        print(f"SQLERR {name}: {e}")
        fails += 1
        continue
    bad = [(c, ty) for c, ty, *_ in desc if BAD.search(str(ty))]
    if bad:
        print(f"TYPE  {name}: " + "; ".join(f"{c}={ty}" for c, ty in bad))
        fails += 1
print(f"LINTED {len(oracle)} queries, FAILURES: {fails}")
sys.exit(1 if fails else 0)
