"""KG-embedding training prep (operators/kgtrain.py).

kg_negatives / kg_walks oracles pin cross-engine bitwise parity;
these tests pin the operator contracts: type consistency, filtered
sampling (no false negatives), collision stepping, edge-following
walks, dead-end absorption, and determinism under repartitioning.
"""

from pyspark.sql import functions as F

from tildener_spark.operators.graphstats import SEP
from tildener_spark.operators.kgtrain import (
    negative_sampling, random_walks, train_transe)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "url string, subj_type string, subj_canonical string, "
              "pred string, obj_type string, obj_canonical string")


def _corpus(spark):
    rows = []
    for i in range(6):
        rows.append(("u", "PER", f"p{i}", "works", "ORG", f"o{i % 3}"))
        rows.append(("u", "ORG", f"o{i % 3}", "in", "LOC", f"l{i % 2}"))
    return _triples(spark, rows)


def test_negatives_type_consistent_and_filtered(spark):
    t = _corpus(spark)
    pos = {(r["subj_type"], r["subj_canonical"], r["pred"],
            r["obj_type"], r["obj_canonical"])
           for r in t.select("subj_type", "subj_canonical", "pred",
                             "obj_type", "obj_canonical")
           .distinct().collect()}
    ents = {}
    for s_t, s, _, o_t, o in pos:
        ents.setdefault(s_t, set()).add(s)
        ents.setdefault(o_t, set()).add(o)
    negs = negative_sampling(t).collect()
    assert negs, "sampler produced nothing"
    for r in negs:
        tup = (r["subj_type"], r["subj"], r["pred"], r["obj_type"],
               r["obj"])
        assert tup not in pos          # filtered: never a positive
        # corrupted entity stays within its type's vocabulary
        assert r["subj"] in ents[r["subj_type"]]
        assert r["obj"] in ents[r["obj_type"]]
    assert {r["slot"] for r in negs} == {"subj", "obj"}


def test_negatives_never_echo_original(spark):
    # corrupting a slot must CHANGE that slot: with >1 entity per
    # type the collision-step rule guarantees replacement != original
    t = _corpus(spark)
    pos = {(r["subj_type"], r["subj_canonical"], r["pred"],
            r["obj_type"], r["obj_canonical"])
           for r in t.select("subj_type", "subj_canonical", "pred",
                             "obj_type", "obj_canonical")
           .distinct().collect()}
    for r in negative_sampling(t).collect():
        if r["slot"] == "subj":
            originals = {s for s_t, s, p, o_t, o in pos
                         if (p, o_t, o) == (r["pred"], r["obj_type"],
                                            r["obj"])
                         and s_t == r["subj_type"]}
            assert r["subj"] not in originals or len(originals) > 1


def test_negatives_deterministic(spark):
    t = _corpus(spark)
    a = sorted(map(tuple, negative_sampling(t).collect()))
    b = sorted(map(tuple, negative_sampling(t.repartition(7))
                   .collect()))
    assert a == b


def test_negatives_singleton_type_dropped(spark):
    # only one LOC entity -> the obj-slot corruption of the LOC
    # triple cannot exist
    t = _triples(spark, [
        ("u", "PER", "a", "born", "LOC", "only"),
        ("u", "PER", "b", "born", "LOC", "only"),
    ])
    negs = negative_sampling(t).collect()
    assert all(r["slot"] == "subj" for r in negs)


def test_walks_follow_edges_and_absorb(spark):
    # line graph a -> b -> c: any walk from the top seed must follow
    # existing edges and park at the sink
    t = _triples(spark, [
        ("u", "PER", "a", "p", "ORG", "b"),
        ("u", "ORG", "b", "p", "LOC", "c"),
    ])
    edges = {(f"PER{SEP}a", f"ORG{SEP}b"), (f"ORG{SEP}b", f"LOC{SEP}c")}
    walks = random_walks(t, n_seeds=3, walks_per_seed=2,
                         n_steps=4).collect()
    assert walks
    for r in walks:
        nodes = r["path"].split(">")
        assert r["n_steps"] == len(nodes) - 1
        for u, v in zip(nodes, nodes[1:]):
            assert (u, v) in edges
        # c is a sink: every walk reaching it stops there
        assert nodes[-1] == f"LOC{SEP}c" or r["n_steps"] < 4


def test_walks_deterministic_and_counted(spark):
    t = _corpus(spark)
    a = sorted(map(tuple, random_walks(t).collect()))
    b = sorted(map(tuple, random_walks(t).collect()))
    assert a == b
    # n_seeds * walks_per_seed rows when the graph has >= n_seeds
    # nodes (this one does: 6 PER + 3 ORG + 2 LOC)
    assert len(a) == 8 * 4


def test_negatives_keep_original_pairs(spark):
    t = _corpus(spark)
    negs = negative_sampling(t, keep_original=True).collect()
    assert negs
    for r in negs:
        if r["slot"] == "subj":
            assert r["subj"] != r["orig_subj"]   # corrupted slot moved
            assert r["obj"] == r["orig_obj"]     # other slot intact
        else:
            assert r["obj"] != r["orig_obj"]
            assert r["subj"] == r["orig_subj"]


def test_transe_loss_decreases_and_is_deterministic(spark):
    t = _corpus(spark)
    res = train_transe(spark, t, dim=4, epochs=3)
    losses = res["loss_by_epoch"]
    assert len(losses) == 4
    assert losses[-1] < losses[0]          # training actually trains
    emb = sorted(map(tuple, res["embeddings"].collect()))
    res2 = train_transe(spark, t.repartition(7), dim=4, epochs=3)
    assert res2["loss_by_epoch"] == losses
    assert sorted(map(tuple, res2["embeddings"].collect())) == emb


def test_transe_zero_epochs_returns_init(spark):
    t = _corpus(spark)
    res = train_transe(spark, t, dim=4, epochs=0)
    assert len(res["loss_by_epoch"]) == 1
    for r in res["embeddings"].collect():
        assert -100 <= r["v"] <= 100        # untouched init range


def test_transe_minibatch_trains_and_is_partition_invariant(spark):
    from tildener_spark.operators.kgtrain import train_transe_minibatch
    t = _corpus(spark)
    res = train_transe_minibatch(spark, t, dim=4, epochs=1, batches=3)
    losses = res["loss_by_epoch"]
    assert len(losses) == 2      # one per epoch's own draw + final
    assert losses[-1] < losses[0]
    emb = sorted(map(tuple, res["embeddings"].collect()))
    res2 = train_transe_minibatch(spark, t.repartition(7), dim=4,
                                  epochs=1, batches=3)
    assert res2["loss_by_epoch"] == losses
    assert sorted(map(tuple, res2["embeddings"].collect())) == emb


def test_transe_minibatch_differs_from_single_batch(spark):
    """batches>1 must change the trajectory — later buckets see the
    earlier buckets' updates, a single bucket does not."""
    from tildener_spark.operators.kgtrain import train_transe_minibatch
    t = _corpus(spark)
    one = train_transe_minibatch(spark, t, dim=4, epochs=2, batches=1)
    many = train_transe_minibatch(spark, t, dim=4, epochs=2, batches=4)
    e1 = sorted(map(tuple, one["embeddings"].collect()))
    e4 = sorted(map(tuple, many["embeddings"].collect()))
    assert e1 != e4


def test_transe_minibatch_zero_epochs_returns_init(spark):
    from tildener_spark.operators.kgtrain import train_transe_minibatch
    t = _corpus(spark)
    res = train_transe_minibatch(spark, t, dim=4, epochs=0)
    assert res["loss_by_epoch"] == [0]
    for r in res["embeddings"].collect():
        assert -100 <= r["v"] <= 100
