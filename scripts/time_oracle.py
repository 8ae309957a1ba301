"""Per-query timing of the driver's correctness gate: for every
queries() entry, time the Spark side (toPandas) and the DuckDB oracle
side separately, so the registry can be kept cheap enough that the
round driver's global budget covers ALL queries (r3 recorded only the
first 50 of 53 — the tail fell off the budget).

Usage: python scripts/time_oracle.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from tildener_spark import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracle_times.json"
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    times = {}
    t_all = time.time()
    for name, fn in queries.items():
        t0 = time.time()
        err = None
        try:
            n = len(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            n, err = -1, f"{type(e).__name__}: {e}"[:200]
        t_spark = time.time() - t0
        t0 = time.time()
        n_o = -1
        if name in oracles and err is None:
            try:
                n_o = len(con.sql(oracles[name]).df())
            except Exception as e:  # noqa: BLE001
                err = f"oracle {type(e).__name__}: {e}"[:200]
        t_oracle = time.time() - t0
        times[name] = {"spark_s": round(t_spark, 2),
                       "oracle_s": round(t_oracle, 2),
                       "rows": n, "oracle_rows": n_o, "err": err}
        print(f"{name:34s} spark {t_spark:7.2f}s  "
              f"oracle {t_oracle:7.2f}s  rows {n}"
              + (f"  ERR {err}" if err else ""), flush=True)
    total = time.time() - t_all
    print(f"TOTAL {total:.1f}s")
    with open(out, "w") as f:
        json.dump({"total_s": round(total, 1), "queries": times}, f,
                  indent=1)


if __name__ == "__main__":
    main()
