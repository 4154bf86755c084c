"""Local differential harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
order-insensitive values (strict: exact equality after canonicalization).

Usage: python tools/check_correctness.py [--json OUT.json] [sf_dir] [query ...]

With ``--json`` the per-query results are also written in the driver's
CORRECTNESS schema: {name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}} (rows-only queries get oracle_rows=None
and schema/hash true when non-empty).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    """pandas DataFrame → sorted list of row tuples with canonical values."""
    import math

    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(repr(v))
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    rows.sort()
    return rows


def main():
    import os

    import duckdb

    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    # data-dependent oracles (IVF centroids) are built at plans import time
    # against this dir — set before the import
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    from cdk_datalake_analytics_comercial_spark.core import get_spark
    from cdk_datalake_analytics_comercial_spark.plans import ORACLES, QUERIES

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    results = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        results[name] = rec
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            rec["err"] = f"spark error: {e}"
            print(f"FAIL  {name}: spark error: {e}")
            continue
        rec["spark_rows"] = len(sdf)
        if name not in ORACLES:
            print(f"rows-only  {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = len(sdf) > 0
            if len(sdf) == 0:
                failures.append(name)
                rec["err"] = "zero rows"
                print(f"FAIL  {name}: zero rows")
            continue
        try:
            odf = con.sql(ORACLES[name]).df()
        except Exception as e:
            failures.append(name)
            rec["err"] = f"oracle error: {e}"
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        rec["oracle_rows"] = len(odf)
        ok = True
        rec["rows_match"] = len(sdf) == len(odf)
        if not rec["rows_match"]:
            ok = False
            print(f"FAIL  {name}: rows spark={len(sdf)} oracle={len(odf)}")
        else:
            rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
            if not rec["schema_match"]:
                ok = False
                print(
                    f"FAIL  {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
                )
            else:
                a, b = canon(sdf), canon(odf)
                rec["hash_match"] = a == b
                if not rec["hash_match"]:
                    ok = False
                    diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                    print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
        if ok:
            print(f"OK    {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"\nwrote {json_out} ({len(results)} queries)")

    print()
    if failures:
        print(f"FAILURES ({len(failures)}): {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
