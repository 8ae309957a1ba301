"""No-Spark parallel-compute control for the fused docs stage.

Runs process_document_py (emit_tokens=False) over the fixture texts
with a multiprocessing pool of P workers, including the per-worker
Arrow conversion the pandas_udf path performs, and reports wall time.
The delta between this and profile_docs_stage's udf_flow at the same
P is the Spark-attributable overhead (Arrow IPC both ways, JVM
row conversion, scheduling).

Usage: python scripts/profile_mp_compute.py [procs] [pages_parquet]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_gaz = None
_inits = None
_cfg = None


def _init():
    global _gaz, _inits, _cfg
    from tildener_spark.config import EngineConfig
    from tildener_spark.datagen import world_gazetteer
    from tildener_spark.operators.classify import build_gazetteer_index
    rows = world_gazetteer()
    _gaz = build_gazetteer_index(rows)
    _inits = frozenset(s for t, s in rows if t == "ORG_INIT")
    _cfg = EngineConfig()


def _work(texts):
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type
    from tildener_spark.operators.document import (
        doc_struct_type, process_document_py)
    docs = [process_document_py(t, _gaz, _inits, _cfg, emit_tokens=False)
            for t in texts]
    n_mentions = 0
    import pandas as pd
    fields = doc_struct_type(False).fields
    pdf = pd.DataFrame({f.name: [d[f.name] for d in docs]
                        for f in fields})
    for f in fields:
        arr = pa.Array.from_pandas(pdf[f.name],
                                   type=to_arrow_type(f.dataType))
        if f.name == "mentions":
            n_mentions += len(arr.flatten())
    return n_mentions


def main() -> None:
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_pages_200000"
    import pyarrow.dataset as ds
    texts = ds.dataset(path).to_table(
        columns=["text"]).column("text").to_pylist()
    chunks = [texts[i::procs * 4] for i in range(procs * 4)]
    with mp.Pool(procs, initializer=_init) as pool:
        pool.map(_work, chunks[:1])  # warm import caches
        t0 = time.perf_counter()
        counts = pool.map(_work, chunks)
        wall = time.perf_counter() - t0
    print({"procs": procs, "n_docs": len(texts),
           "wall": round(wall, 2), "mentions": sum(counts)})


if __name__ == "__main__":
    main()
