"""Single-process decomposition of the fused UDF's Python side:

  compute     process_document_py over N docs (emit_tokens=False)
  pdf_build   the pandas DataFrame the pandas_udf returns
  spark_conv  what Spark's ArrowStreamPandasUDFSerializer then does:
              pa.Array.from_pandas(col, type=field_type) per field
  flat_build  alternative: accumulate flat per-field lists during the
              doc loop, then pa.ListArray.from_arrays(offsets,
              StructArray.from_arrays(...)) — the mapInArrow shape

If spark_conv >> flat_build, converting the UDF to mapInArrow with a
flat builder recovers the difference per core.

Usage: python scripts/profile_arrow_out.py [n_docs] [pages_parquet]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.dataset as ds  # noqa: E402

from tildener_spark.config import EngineConfig  # noqa: E402
from tildener_spark.operators.classify import (  # noqa: E402
    build_gazetteer_index)
from tildener_spark.operators.document import (  # noqa: E402
    doc_struct_type, process_document_py)


def arrow_type(spark_type):
    from pyspark.sql.pandas.types import to_arrow_type
    return to_arrow_type(spark_type)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_pages_200000"
    tbl = ds.dataset(path).head(n, columns=["text"])
    texts = tbl.column("text").to_pylist()
    print(f"{len(texts)} docs")

    from tildener_spark.datagen import world_gazetteer
    gaz_rows = world_gazetteer()
    gaz = build_gazetteer_index(gaz_rows)
    inits = frozenset(s for t, s in gaz_rows if t == "ORG_INIT")
    cfg = EngineConfig()

    t0 = time.perf_counter()
    docs = [process_document_py(t, gaz, inits, cfg, emit_tokens=False)
            for t in texts]
    t_compute = time.perf_counter() - t0

    fields = [f for f in doc_struct_type(False).fields]
    t0 = time.perf_counter()
    pdf = pd.DataFrame({f.name: [d[f.name] for d in docs]
                        for f in fields})
    t_pdf = time.perf_counter() - t0

    t0 = time.perf_counter()
    arrs = {}
    for f in fields:
        at = arrow_type(f.dataType)
        arrs[f.name] = pa.Array.from_pandas(pdf[f.name], type=at)
    t_conv = time.perf_counter() - t0

    # flat build: re-walk docs accumulating per-field flat lists
    t0 = time.perf_counter()
    flat_arrs = {}
    for f in fields:
        at = arrow_type(f.dataType)      # list<struct<...>>
        st = at.value_type               # struct
        nsub = st.num_fields
        cols = [[] for _ in range(nsub)]
        offsets = [0]
        total = 0
        name = f.name
        for d in docs:
            rows = d[name]
            total += len(rows)
            offsets.append(total)
            for r in rows:
                for i in range(nsub):
                    cols[i].append(r[i])
        sub = [pa.array(cols[i], type=st.field(i).type)
               for i in range(nsub)]
        flat_arrs[f.name] = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.StructArray.from_arrays(sub, fields=list(st)))
    t_flat = time.perf_counter() - t0

    for name in arrs:
        assert arrs[name].equals(flat_arrs[name]), name

    print({"n": n,
           "compute": round(t_compute, 2),
           "pdf_build": round(t_pdf, 2),
           "spark_conv": round(t_conv, 2),
           "flat_build": round(t_flat, 2),
           "ms_per_doc_compute": round(1000 * t_compute / n, 3)})


if __name__ == "__main__":
    main()
