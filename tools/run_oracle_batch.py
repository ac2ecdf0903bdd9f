#!/usr/bin/env python3
"""Batch oracle runner for RandomizedOracleSpec: executes each SQL from a
{name: sql} JSON file in DuckDB and writes every result row as one TSV
line `name\tseries\tts\tv...` (NULL -> empty field, NaN -> "NaN",
doubles via repr-precision %.17g). A `name\t__DONE__\t<nrows>` marker
confirms each query ran; `name\t__ERROR__\t<msg>` records a failure
without aborting the batch. Usage: run_oracle_batch.py <sqls.json> <out.tsv>"""
import sys, json, math
import duckdb

sqls = json.load(open(sys.argv[1]))
con = duckdb.connect()
with open(sys.argv[2], "w") as out:
    for name in sorted(sqls):
        try:
            rows = con.sql(sqls[name]).fetchall()
        except Exception as e:
            msg = str(e).replace("\t", " ").replace("\n", " ")
            out.write(f"{name}\t__ERROR__\t{msg}\n")
            continue
        for r in rows:
            vals = []
            for v in r:
                if v is None:
                    vals.append("")
                elif isinstance(v, float):
                    vals.append("NaN" if math.isnan(v) else format(v, ".17g"))
                else:
                    vals.append(str(v))
            out.write(name + "\t" + "\t".join(vals) + "\n")
        out.write(f"{name}\t__DONE__\t{len(rows)}\n")
