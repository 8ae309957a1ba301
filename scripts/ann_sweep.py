"""ANN recall-vs-cost sweep: the evidence behind the q21/q21b defaults.

lsh_topk's (n_bits, n_tables) and ivf_topk's (n_cells, n_probe) were
hand-set (VERDICT r3 item 6).  This sweep measures, on BOTH a
clustered embedding mix (the driver's synthetic embeddings table —
planted near-duplicate clusters, the case ANN exists for) and a
uniform mix (worst case: no structure for the buckets to exploit):

  * recall@5 vs brute_force_topk (exact ground truth, computed once
    per dataset);
  * candidate-pair volume (the cost that scales: each candidate is
    one exact cosine; wall-clock on this shared VM is too noisy to
    rank configs, candidate volume is the deterministic cost proxy —
    it is reported alongside a single wall reading per config);

and writes BENCH/ANN_SWEEP.md with the table driving the defaults.

Usage: python scripts/ann_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

DIM = 64
K = 5


def datasets(spark, sf_dir):
    """(name, DataFrame) pairs: clustered (driver testdata) and
    uniform (seeded random unit vectors, same cardinality/dim)."""
    clustered = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = clustered.count()
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((n, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    uniform = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    return [("clustered", clustered), ("uniform", uniform)]


def truth_sets(emb):
    from tildener_spark.operators.similarity import brute_force_topk
    rows = brute_force_topk(emb, k=K).collect()
    t: dict = {}
    for r in rows:
        t.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    return t


def recall(approx_rows, truth):
    got: dict = {}
    for r in approx_rows:
        got.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    num = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    den = sum(len(t) for t in truth.values())
    return num / max(den, 1)


def main() -> None:
    from tildener_spark import get_spark
    from tildener_spark.operators.similarity import (
        _lsh_candidate_pairs, ivf_topk, lsh_topk)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    lines = ["# ANN recall-vs-cost sweep", "",
             f"Corpus: {sf_dir}/embeddings.parquet (clustered) and a "
             "seeded uniform unit-vector set of the same size/dim; "
             f"recall@{K} vs brute_force_topk; candidate volume = "
             "distinct scored pairs (the deterministic cost proxy — "
             "each candidate is one exact cosine).", ""]
    for name, emb in datasets(spark, sf_dir):
        emb = emb.cache()
        n = emb.count()
        truth = truth_sets(emb)
        lines += [f"## {name} ({n} vectors, dim {DIM})", "",
                  "### lsh_topk (hyperplane, multi-table)", "",
                  "| n_bits | n_tables | candidates | recall@5 | wall s |",
                  "|---|---|---|---|---|"]
        for n_bits in (4, 5, 6, 8):
            for n_tables in (4, 8, 16, 24, 32):
                t0 = time.perf_counter()
                cand = _lsh_candidate_pairs(
                    emb, "vec_id", "embedding", DIM, 42, n_bits,
                    n_tables, ordered=True).count()
                rows = lsh_topk(emb, k=K, n_bits=n_bits,
                                n_tables=n_tables).collect()
                sec = time.perf_counter() - t0
                r = recall(rows, truth)
                mark = (" **<- q21 operating point / default**"
                        if (n_bits, n_tables) == (5, 24) else "")
                lines.append(
                    f"| {n_bits} | {n_tables} | {cand} | {r:.3f} "
                    f"| {sec:.1f}{mark} |")
                print(f"{name} lsh bits={n_bits} L={n_tables} "
                      f"cand={cand} recall={r:.3f} {sec:.1f}s",
                      flush=True)
        lines += ["", "### ivf_topk (coarse quantizer)", "",
                  "| n_cells | n_probe | recall@5 | wall s |",
                  "|---|---|---|---|"]
        for n_cells in (8, 16, 32):
            for n_probe in (1, 2, 4, 8):
                if n_probe > n_cells:
                    continue
                t0 = time.perf_counter()
                rows = ivf_topk(emb, k=K, n_cells=n_cells,
                                n_probe=n_probe).collect()
                sec = time.perf_counter() - t0
                r = recall(rows, truth)
                mark = (" **<- q21b operating point / default**"
                        if (n_cells, n_probe) == (16, 4) else "")
                lines.append(f"| {n_cells} | {n_probe} | {r:.3f} "
                             f"| {sec:.1f}{mark} |")
                print(f"{name} ivf cells={n_cells} probe={n_probe} "
                      f"recall={r:.3f} {sec:.1f}s", flush=True)
        lines.append("")
        emb.unpersist()
    out = os.path.join(REPO, "BENCH", "ANN_SWEEP.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
