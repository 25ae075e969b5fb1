#!/usr/bin/env python3
"""Preflight twin of the driver's correctness gate: for each query result
dumped by graft.Verify, run its oracle SQL in DuckDB over the same sf dir's
parquet tables and compare rows / schema (column names) / a value hash with
columns sorted by name (the driver sorts columns by name before hashing).

Usage: verify_compare.py <sfDir> <verifyOutDir>
"""
import hashlib, json, pathlib, sys

import duckdb

sf, out = sys.argv[1], sys.argv[2]
outp = pathlib.Path(out)
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = pathlib.Path(sf) / f"{t}.parquet"
    if p.exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

oracle = json.load(open(outp / "oracle_sql.json"))
results = {}
for name in sorted(d.name for d in outp.iterdir() if d.is_dir()):
    row = dict(rows_match=None, schema_match=None, hash_match=None, err=None)
    try:
        spark = con.execute(
            f"SELECT * FROM parquet_scan('{outp/name}/*.parquet')").df()
        if name not in oracle:
            row["err"] = "no_oracle"
            row["spark_rows"] = len(spark)
            results[name] = row
            continue
        ora = con.execute(oracle[name]).df()
        row["spark_rows"], row["oracle_rows"] = len(spark), len(ora)
        row["rows_match"] = len(spark) == len(ora)
        scols, ocols = sorted(spark.columns), sorted(ora.columns)
        row["schema_match"] = scols == ocols
        def h(df, cols):
            m = hashlib.sha256()
            for r in df[cols].itertuples(index=False):
                # row terminator: without it, value shifts that realign
                # across row boundaries would hash identical
                m.update(("|".join(str(v) for v in r)).encode() + b"\n")
            return m.hexdigest()
        if row["rows_match"] and row["schema_match"]:
            row["hash_match"] = h(spark, scols) == h(ora, ocols)
    except Exception as e:
        row["err"] = f"{type(e).__name__}: {e}"[:200]
    results[name] = row

bad = {k: v for k, v in results.items()
       if v["err"] not in (None, "no_oracle")
       or v["err"] is None and not (v["rows_match"] and v["schema_match"] and v["hash_match"])}
print(json.dumps(results, indent=1, default=str))
print(f"\n{len(results)} queries, {len(bad)} problems", file=sys.stderr)
for k, v in bad.items():
    print("PROBLEM:", k, v, file=sys.stderr)
sys.exit(1 if bad else 0)
