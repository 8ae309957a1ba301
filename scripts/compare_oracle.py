"""Local stand-in for the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, compare row count + schema + order-insensitive values.

Usage: python scripts/compare_oracle.py [sf_dir] [query ...]

Set SPARK_GRAFT_GATE_OUT=<path.json> to also write the per-query
results (rows/schema/hash booleans + wall seconds) as the committed
full-registry self-gate artifact (CORRECTNESS_SELF.json) — the
driver's own file caps at 50 queries, this one covers the whole
registry (r4 verdict item 2).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from tildener_spark import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else repr(v))
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    gate: dict = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"{name:34s} rows-only: {n} rows")
                rec.update(rows_match=True, spark_rows=n,
                           err="rows-only (no oracle)")
            except Exception as e:
                print(f"{name:34s} ERROR {type(e).__name__}: {e}")
                rec["err"] = f"{type(e).__name__}: {e}"
                n_fail += 1
            rec["wall_sec"] = round(time.perf_counter() - t0, 2)
            gate[name] = rec
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:34s} ERROR {type(e).__name__}: {e}")
            rec["err"] = f"{type(e).__name__}: {e}"
            rec["wall_sec"] = round(time.perf_counter() - t0, 2)
            gate[name] = rec
            n_fail += 1
            continue
        scols = sorted(sdf.columns)
        ocols = sorted(odf.columns)
        srows = canon(sdf.to_dict("records"), scols)
        orows = canon(odf.to_dict("records"), ocols)
        rec.update(spark_rows=len(srows), oracle_rows=len(orows),
                   schema_match=scols == ocols,
                   rows_match=len(srows) == len(orows))
        if scols != ocols:
            print(f"{name:34s} SCHEMA MISMATCH {scols} vs {ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"{name:34s} ROWCOUNT {len(srows)} vs {len(orows)}")
            n_fail += 1
        elif srows != orows:
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            print(f"{name:34s} VALUE MISMATCH e.g. {diff[:2]}")
            n_fail += 1
        else:
            rec["hash_match"] = True
            print(f"{name:34s} OK ({len(srows)} rows)")
            n_pass += 1
        rec["wall_sec"] = round(time.perf_counter() - t0, 2)
        gate[name] = rec
    print(f"\n{n_pass} pass, {n_fail} fail")
    out_path = os.environ.get("SPARK_GRAFT_GATE_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass,
                       "n_fail": n_fail,
                       "n_queries": len(gate),
                       "queries": gate}, f, indent=1)
        print(f"wrote {out_path}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
