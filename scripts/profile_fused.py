"""cProfile of the fused per-document pass — pure Python, no Spark.

The fused Arrow UDF (operators/document.py:process_document) is a
plain Python loop over documents; profiling that loop directly (same
gazetteer index, same config, same deterministic datagen corpus as
the scaling bench) shows exactly where per-document CPU goes without
JVM / Arrow noise.  Used to pick the next hot-path lever after the
round-3 columnar TokenTable rework.

Usage: python scripts/profile_fused.py [n_docs] [sort] [--tokens]
  sort: tottime (default) | cumtime
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 2000
    sort = args[1] if len(args) > 1 else "tottime"
    emit_tokens = "--tokens" in sys.argv

    from tildener_spark.config import EngineConfig
    from tildener_spark.datagen import gen_doc, world_gazetteer
    from tildener_spark.operators.classify import build_gazetteer_index
    from tildener_spark.operators.document import process_document_py
    from tildener_spark.operators.tokenize import batch_token_spans

    texts = [gen_doc(i)["text"] for i in range(n)]
    gaz_rows = world_gazetteer()
    inits = frozenset(s for t, s in gaz_rows if t == "ORG_INIT")
    gaz = build_gazetteer_index(gaz_rows)
    cfg = EngineConfig()

    # warm the per-raw-token memo caches like a long-lived worker
    for t in texts[:64]:
        process_document_py(t, gaz, inits, cfg, emit_tokens)

    # the production UDF precomputes raw-token spans per Arrow batch
    # (document.py process_document); mirror that shape here
    t0 = time.perf_counter()
    spans = batch_token_spans(texts)
    for t, sp in zip(texts, spans):
        process_document_py(t, gaz, inits, cfg, emit_tokens, spans=sp)
    plain = time.perf_counter() - t0
    print(f"unprofiled: {n} docs in {plain:.2f}s "
          f"({plain / n * 1e3:.3f} ms/doc, emit_tokens={emit_tokens})")

    pr = cProfile.Profile()
    pr.enable()
    spans = batch_token_spans(texts)
    for t, sp in zip(texts, spans):
        process_document_py(t, gaz, inits, cfg, emit_tokens, spans=sp)
    pr.disable()
    stats = pstats.Stats(pr)
    stats.sort_stats(sort).print_stats(30)


if __name__ == "__main__":
    main()
