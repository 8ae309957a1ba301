"""Entity-graph analytics (operators/graphstats.py): evidence-weighted
PageRank with dangling correction and degree / capped-2-hop topology
stats, both quantized/integer so the DuckDB oracle hashes exactly
(kg_pagerank / kg_graph_stats in __spark_entry__.py)."""

import math

import pytest
from pyspark.sql import functions as F

from tildener_spark.operators.graphstats import (
    SEP, entity_edges, entity_pagerank, graph_degree_stats,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj_type string, subj_canonical string, "
              "obj_type string, obj_canonical string")


@pytest.fixture(scope="module")
def diamond_edges(spark):
    # a -> b (x2 evidence), a -> c, b -> d, c -> d, plus a self-loop
    # on a (must be dropped) and a dangling sink d
    t = _triples(spark, [
        ("PER", "a", "ORG", "b"), ("PER", "a", "ORG", "b"),
        ("PER", "a", "LOC", "c"),
        ("ORG", "b", "PER", "d"),
        ("LOC", "c", "PER", "d"),
        ("PER", "a", "PER", "a"),
    ])
    return entity_edges(t).persist()


def test_entity_edges_weights_and_self_loops(diamond_edges):
    got = {(r["src"], r["dst"]): r["n_evidence"]
           for r in diamond_edges.collect()}
    assert got[(f"PER{SEP}a", f"ORG{SEP}b")] == 2
    assert got[(f"PER{SEP}a", f"LOC{SEP}c")] == 1
    assert len(got) == 4  # self-loop dropped
    assert (f"PER{SEP}a", f"PER{SEP}a") not in got


def test_pagerank_matches_dense_reference(diamond_edges):
    """Replay the quantized fixpoint in plain Python and require
    equality to the DataFrame implementation on every node."""
    edges = [(r["src"], r["dst"], r["n_evidence"])
             for r in diamond_edges.collect()]
    nodes = sorted({s for s, _, _ in edges}
                   | {d for _, d, _ in edges})
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    rank = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(5):
        dangling = sum(rank[v] for v in nodes if v not in out_w)
        contrib = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            contrib[d] += rank[s] * (w / out_w[s])
        rank = {
            v: round((1.0 - 0.85) / n
                     + 0.85 * (contrib[v] + dangling / n), 9)
            for v in nodes
        }
    got = {f"{r['ne_type']}{SEP}{r['canonical']}": r["rank"]
           for r in entity_pagerank(diamond_edges).collect()}
    assert set(got) == set(rank)
    for v in nodes:
        assert math.isclose(got[v], rank[v], abs_tol=2e-9), (
            v, got[v], rank[v])
    # mass conservation (dangling redistributed): sums to ~1
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-6)
    # the double-evidence target b outranks the single-evidence c
    assert got[f"ORG{SEP}b"] > got[f"LOC{SEP}c"]
    # the sink d collects from both paths: highest rank
    assert got[f"PER{SEP}d"] == max(got.values())


def test_pagerank_empty_graph(spark):
    empty = entity_edges(_triples(spark, []).limit(0))
    assert entity_pagerank(empty).count() == 0


def test_pagerank_partition_invariant(diamond_edges):
    base = {(r["ne_type"], r["canonical"]): r["rank"]
            for r in entity_pagerank(diamond_edges).collect()}
    shuffled = {(r["ne_type"], r["canonical"]): r["rank"]
                for r in entity_pagerank(
                    diamond_edges.repartition(7)).collect()}
    assert base == shuffled  # quantization makes this exact


def test_degree_stats_diamond(diamond_edges):
    got = {(r["ne_type"], r["canonical"]): r
           for r in graph_degree_stats(diamond_edges).collect()}
    a = got[("PER", "a")]
    assert (a["out_deg"], a["in_deg"]) == (2, 0)
    assert a["degree"] == 2 and a["evidence"] == 3
    # a's 2-hop set over top-k neighbours: {b, c, d}
    assert a["n_2hop"] == 3
    d = got[("PER", "d")]
    assert (d["out_deg"], d["in_deg"]) == (0, 2)
    # d's 2-hop: {b, c, a}
    assert d["n_2hop"] == 3


def test_degree_stats_hub_cap_bounds_two_hop(spark):
    # star: hub h -> s0..s9; with k=3 the hub expands only its top-3
    # neighbours (all weight 1 -> tie-break by node id: s0, s1, s2)
    rows = [("ORG", "h", "PER", f"s{i}") for i in range(10)]
    edges = entity_edges(_triples(spark, rows))
    got = {(r["ne_type"], r["canonical"]): r
           for r in graph_degree_stats(edges, k=3).collect()}
    h = got[("ORG", "h")]
    assert h["degree"] == 10 and h["out_deg"] == 10
    assert h["n_2hop"] == 3  # capped expansion
    # every spoke still sees the hub plus the hub's top-3 (minus self)
    s0 = got[("PER", "s0")]
    assert s0["in_deg"] == 1 and s0["degree"] == 1
    assert s0["n_2hop"] == 3  # h + {s1, s2} (s0 excluded as self)


def test_entity_timeline_aggregates(spark):
    from datetime import datetime

    from tildener_spark.operators.graphstats import entity_timeline

    t = spark.createDataFrame(
        [("PER", "a", "ORG", "b", "u1"),
         ("PER", "a", "ORG", "b", "u1"),   # same page twice
         ("PER", "a", "LOC", "c", "u2")],
        "subj_type string, subj_canonical string, "
        "obj_type string, obj_canonical string, url string")
    pages = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1)), ("u2", datetime(2024, 1, 3))],
        "url string, warc_ts timestamp")
    got = {(r["ne_type"], r["canonical"]): r
           for r in entity_timeline(t, pages).collect()}
    a = got[("PER", "a")]
    assert a["n_pages"] == 2 and a["n_endpoints"] == 3
    assert a["first_seen"] == datetime(2024, 1, 1)
    assert a["last_seen"] == datetime(2024, 1, 3)
    b = got[("ORG", "b")]
    assert b["n_pages"] == 1 and b["n_endpoints"] == 2
    assert b["first_seen"] == b["last_seen"] == datetime(2024, 1, 1)


def test_communities_two_cliques(spark):
    """Two triangles joined by one weak bridge: LPA must separate
    them, labels deterministic under repartitioning."""
    from tildener_spark.operators.graphstats import entity_communities

    rows = []
    for x, y in [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
                 ("b1", "b2"), ("b2", "b3"), ("b1", "b3")]:
        rows += [("PER", x, "PER", y)] * 3  # strong intra-clique
    rows += [("PER", "a1", "PER", "b1")]    # weak bridge
    edges = entity_edges(_triples(spark, rows)).persist()
    got = {r["canonical"]: r for r in
           entity_communities(edges).collect()}
    a_lbls = {got[x]["community"] for x in ("a1", "a2", "a3")}
    b_lbls = {got[x]["community"] for x in ("b1", "b2", "b3")}
    assert len(a_lbls) == 1 and len(b_lbls) == 1
    assert a_lbls != b_lbls
    assert all(got[x]["community_size"] == 3 for x in got)
    again = {r["canonical"]: r["community"] for r in
             entity_communities(edges.repartition(5)).collect()}
    assert again == {k: v["community"] for k, v in got.items()}


def test_triangles_clique_plus_pendant(spark):
    """K3 plus a pendant: clique nodes have 1 triangle each; the
    pendant and its attachment point get the right coefficients."""
    from tildener_spark.operators.graphstats import graph_triangles

    rows = [("PER", "a", "PER", "b"), ("PER", "b", "PER", "c"),
            ("PER", "a", "PER", "c"), ("PER", "c", "PER", "p")]
    got = {r["canonical"]: r for r in
           graph_triangles(entity_edges(_triples(spark, rows))).collect()}
    assert got["a"]["n_tri"] == got["b"]["n_tri"] == 1
    assert got["a"]["clustering"] == 1.0
    # c: mutual degree 3 (a, b, p), 1 triangle -> 2/(3*2) = 1/3
    assert got["c"]["m_deg"] == 3 and got["c"]["n_tri"] == 1
    assert got["c"]["clustering"] == round(1 / 3, 9)
    assert got["p"]["m_deg"] == 1 and got["p"]["n_tri"] == 0
    assert got["p"]["clustering"] == 0.0


def test_triangles_mutual_cap_prunes_hub(spark):
    """Hub h in a triangle with (x, y) plus 10 spokes; with k=2 the
    hub keeps only its top-2 neighbours, so edges to the spokes are
    not mutual and the spokes drop out of the capped graph."""
    from tildener_spark.operators.graphstats import graph_triangles

    rows = [("PER", "h", "PER", "x"), ("PER", "h", "PER", "x"),
            ("PER", "h", "PER", "y"), ("PER", "h", "PER", "y"),
            ("PER", "x", "PER", "y")]
    rows += [("PER", "h", "PER", f"s{i}") for i in range(10)]
    got = {r["canonical"]: r for r in
           graph_triangles(entity_edges(_triples(spark, rows)),
                           k=2).collect()}
    assert got["h"]["m_deg"] == 2 and got["h"]["n_tri"] == 1
    assert got["h"]["clustering"] == 1.0
    # spokes keep h in their top-2 but h dropped them: not mutual,
    # so they vanish from the capped graph entirely
    assert set(got) == {"h", "x", "y"}


def test_graph_bfs_distances(spark):
    from tildener_spark.operators.graphstats import graph_bfs
    # path graph a-b-c-d-e plus isolated pair x-y; 'b' carries the
    # heaviest incident mass (10+1) -> single seed at b (n_seeds=1)
    edges = spark.createDataFrame(
        [("P␟a", "P␟b", 10), ("P␟b", "P␟c", 1), ("P␟c", "P␟d", 1),
         ("P␟d", "P␟e", 1), ("P␟x", "P␟y", 1)],
        "src string, dst string, n_evidence long")
    out = {r["canonical"]: r["dist"]
           for r in graph_bfs(edges, n_seeds=1, max_hops=2).collect()}
    # e is 3 hops from b -> absent at max_hops=2; x/y unreachable
    assert out == {"b": 0, "a": 1, "c": 1, "d": 2}


def test_graph_bfs_multi_seed_min_dist(spark):
    from tildener_spark.operators.graphstats import graph_bfs
    # masses: b = 9+1 = 10, d = 1+9 = 10, a = e = 9, c = 2 ->
    # seeds {b, d}; every other node is 1 hop from a seed and the
    # anti-join must keep the MIN dist (c is 1 from both seeds)
    edges = spark.createDataFrame(
        [("P␟a", "P␟b", 9), ("P␟b", "P␟c", 1), ("P␟c", "P␟d", 1),
         ("P␟d", "P␟e", 9)],
        "src string, dst string, n_evidence long")
    out = {r["canonical"]: r["dist"]
           for r in graph_bfs(edges, n_seeds=2, max_hops=4).collect()}
    assert out == {"b": 0, "d": 0, "a": 1, "c": 1, "e": 1}


def test_link_prediction_square(spark):
    """4-cycle a-b-c-d (no diagonals): the two diagonals (a,c) and
    (b,d) are exactly the predicted non-edges, each with 2 common
    neighbours of mutual degree 2 -> ra_q = 2 * (10^12 // 2) = 10^12,
    jaccard = 2 / (2 + 2 - 2) = 1.0."""
    from tildener_spark.operators.graphstats import link_prediction

    rows = [("PER", "a", "PER", "b"), ("PER", "b", "PER", "c"),
            ("PER", "c", "PER", "d"), ("PER", "d", "PER", "a")]
    got = {(r["canonical_a"], r["canonical_b"]): r for r in
           link_prediction(entity_edges(_triples(spark, rows)))
           .collect()}
    assert set(got) == {("a", "c"), ("b", "d")}
    for r in got.values():
        assert r["n_common"] == 2
        assert r["ra_q"] == 10**12
        assert r["jaccard"] == 1.0


def test_link_prediction_excludes_existing_edges(spark):
    """Triangle a-b-c plus pendant p on c: every pair of the
    triangle is an existing edge, so the only candidates are the
    pendant's 2-hop pairs (p,a) and (p,b) through c (m_deg(c)=3)."""
    from tildener_spark.operators.graphstats import link_prediction

    rows = [("PER", "a", "PER", "b"), ("PER", "b", "PER", "c"),
            ("PER", "a", "PER", "c"), ("PER", "c", "PER", "p")]
    got = {(r["canonical_a"], r["canonical_b"]): r for r in
           link_prediction(entity_edges(_triples(spark, rows)))
           .collect()}
    assert set(got) == {("a", "p"), ("b", "p")}
    for r in got.values():
        assert r["n_common"] == 1
        assert r["ra_q"] == 10**12 // 3
        # deg(a)=2 (b, c), deg(p)=1 (c) -> 1/(2+1-1)
        assert r["jaccard"] == 0.5


def test_kcore_peels_fringe_keeps_clique(spark):
    """K4 core with a pendant chain and a star fringe: 3-core must
    keep exactly the K4 (each node's core degree = 3), peeling the
    chain/star in cascade."""
    from tildener_spark.operators.graphstats import graph_kcore

    k4 = [("PER", a, "PER", b) for i, a in enumerate("abcd")
          for b in "abcd"[i + 1:]]
    fringe = [("PER", "a", "PER", "p1"), ("PER", "p1", "PER", "p2"),
              ("PER", "b", "PER", "s1"), ("PER", "b", "PER", "s2"),
              ("PER", "b", "PER", "s3")]
    got = {r["canonical"]: r["core_deg"] for r in
           graph_kcore(entity_edges(_triples(spark, k4 + fringe)),
                       k=3).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_empty_when_k_exceeds_connectivity(spark):
    from tildener_spark.operators.graphstats import graph_kcore

    rows = [("PER", "a", "PER", "b"), ("PER", "b", "PER", "c")]
    assert graph_kcore(entity_edges(_triples(spark, rows)),
                       k=2).count() == 0


def test_hits_star_hub_authority(spark):
    """Star subj h -> o1..o3 (+ one strong edge): h is the unique
    hub (score 1.0), objects are authorities; the strong-evidence
    target dominates with authority exactly 1.0 after max-norm."""
    from tildener_spark.operators.graphstats import graph_hits

    rows = ([("PER", "h", "ORG", "o1")] * 2
            + [("PER", "h", "ORG", "o2"), ("PER", "h", "LOC", "o3")])
    got = {r["canonical"]: r for r in
           graph_hits(entity_edges(_triples(spark, rows)),
                      iterations=3).collect()}
    assert got["h"]["hub"] == 1.0 and got["h"]["authority"] == 0.0
    assert got["o1"]["authority"] == 1.0  # max-normalized top
    assert got["o1"]["hub"] == 0.0
    assert 0.0 < got["o2"]["authority"] < 1.0
    assert got["o2"]["authority"] == got["o3"]["authority"]


def test_hits_partition_invariant(spark):
    from tildener_spark.operators.graphstats import graph_hits

    rows = [("PER", "a", "ORG", "b"), ("ORG", "b", "LOC", "c"),
            ("PER", "a", "LOC", "c"), ("LOC", "c", "PER", "d")] * 2
    e = entity_edges(_triples(spark, rows))
    base = sorted(map(tuple, graph_hits(e, iterations=4).collect()))
    again = sorted(map(tuple,
                       graph_hits(e.repartition(7),
                                  iterations=4).collect()))
    assert base == again


def test_ppr_seed_dominates_and_mass_conserved(spark):
    """Chain a -> {b,e}, b -> c -> d with heavy mass on a: a is the
    unique seed, holds the max rank at every iteration (teleport +
    dangling return land only on it), the symmetric twins b and e
    get bitwise-equal ranks, every node is reached, and total rank
    mass stays 1 up to the round(.,9) quantization.  (Strict decay
    along the chain is NOT asserted: the a->b->c->d->a dangling
    feedback oscillates in antiphase and only damps near the
    fixpoint — values here are pinned instead by the kg_ppr oracle's
    bitwise replay.)"""
    from tildener_spark.operators.graphstats import (
        personalized_pagerank)

    # mass(a) = 10 (5 to b, 5 to e) dominates b's 6, so a is THE seed
    rows = ([("PER", "a", "ORG", "b")] * 5
            + [("PER", "a", "PER", "e")] * 5
            + [("ORG", "b", "LOC", "c"), ("LOC", "c", "PER", "d")])
    got = {r["canonical"]: r for r in
           personalized_pagerank(entity_edges(_triples(spark, rows)),
                                 n_seeds=1, iterations=12).collect()}
    assert got["a"]["is_seed"]
    assert not any(got[x]["is_seed"] for x in "bcde")
    assert all(got[x]["rank"] > 0.0 for x in "abcde")
    assert got["a"]["rank"] == max(r["rank"] for r in got.values())
    assert got["b"]["rank"] == got["e"]["rank"]  # symmetric twins
    assert abs(sum(r["rank"] for r in got.values()) - 1.0) < 1e-6


def test_ppr_seed_selection_by_mass_tiebreak(spark):
    """Two nodes tie on evidence mass: the lexicographically smaller
    node id must win the seed slot (deterministic, engine-exact)."""
    from tildener_spark.operators.graphstats import (
        personalized_pagerank)

    rows = [("PER", "zz", "ORG", "mm"), ("PER", "aa", "ORG", "mm")]
    got = {r["canonical"]: r["is_seed"] for r in
           personalized_pagerank(entity_edges(_triples(spark, rows)),
                                 n_seeds=2).collect()}
    # mm has mass 2 (top); aa and zz tie at 1 -> aa wins slot 2
    assert got["mm"] and got["aa"] and not got["zz"]


def test_ppr_partition_invariant(spark):
    from tildener_spark.operators.graphstats import (
        personalized_pagerank)

    rows = [("PER", "a", "ORG", "b"), ("ORG", "b", "LOC", "c"),
            ("PER", "a", "LOC", "c"), ("LOC", "c", "PER", "d")] * 3
    e = entity_edges(_triples(spark, rows))
    base = sorted(map(tuple,
                      personalized_pagerank(e, n_seeds=2).collect()))
    again = sorted(map(tuple,
                       personalized_pagerank(e.repartition(9),
                                             n_seeds=2).collect()))
    assert base == again


def test_edge_timeline_span_and_counts(spark):
    """One edge seen in two crawls 3600s apart plus a single-doc
    edge: spans, doc counts, and evidence counts are exact."""
    from tildener_spark.operators.graphstats import edge_timeline

    ct = spark.createDataFrame(
        [("u1", "PER", "a", "vadi", "ORG", "b"),
         ("u1", "PER", "a", "vadi", "ORG", "b"),   # same doc twice
         ("u2", "PER", "a", "vadi", "ORG", "b"),
         ("u2", "LOC", "c", "atrodas", "PER", "d")],
        "url string, subj_type string, subj_canonical string, "
        "pred string, obj_type string, obj_canonical string")
    pages = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00"), ("u2", "2024-01-01 01:00:00")],
        "url string, ts string").select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts"))
    got = {(r["subj_canonical"], r["pred"], r["obj_canonical"]): r
           for r in edge_timeline(ct, pages).collect()}
    ab = got[("a", "vadi", "b")]
    assert ab["n_docs"] == 2 and ab["n_evidence"] == 3
    assert ab["span_s"] == 3600
    cd = got[("c", "atrodas", "d")]
    assert cd["n_docs"] == 1 and cd["span_s"] == 0
    assert cd["first_seen"] == cd["last_seen"]


def test_predicate_profile_dominant_signature(spark):
    """vadi: 3x PER->ORG + 1x ORG->ORG (tie-safe), viena: single
    triple — volumes, pair counts, signature counts, and shares are
    exact; the dominant signature argmax follows (count desc, types
    asc)."""
    from tildener_spark.operators.graphstats import predicate_profile

    ct = spark.createDataFrame(
        [("PER", "a", "vadi", "ORG", "x"),
         ("PER", "a", "vadi", "ORG", "x"),   # duplicate pair
         ("PER", "b", "vadi", "ORG", "y"),
         ("ORG", "z", "vadi", "ORG", "x"),
         ("LOC", "r", "viena", "PER", "a")],
        "subj_type string, subj_canonical string, pred string, "
        "obj_type string, obj_canonical string")
    got = {r["pred"]: r for r in predicate_profile(ct).collect()}
    v = got["vadi"]
    assert v["n_triples"] == 4 and v["n_pairs"] == 3
    assert v["n_signatures"] == 2
    assert (v["top_subj_type"], v["top_obj_type"]) == ("PER", "ORG")
    assert v["top_sig_n"] == 3 and v["top_sig_share"] == 0.75
    u = got["viena"]
    assert u["n_triples"] == u["n_pairs"] == u["n_signatures"] == 1
    assert u["top_sig_share"] == 1.0


def _full_triples(spark, rows):
    return spark.createDataFrame(
        rows, "url string, subj_type string, subj_canonical string, "
              "pred string, obj_type string, obj_canonical string")


def test_entity_cards_ranks_and_degrees(spark):
    from tildener_spark.operators.graphstats import entity_cards
    t = _full_triples(spark, [
        ("u1", "PER", "a", "works", "ORG", "b"),
        ("u1", "PER", "a", "works", "ORG", "b"),
        ("u2", "PER", "a", "born", "LOC", "c"),
        ("u2", "ORG", "b", "in", "LOC", "c"),
    ])
    got = {(r["ne_type"], r["canonical"]): r
           for r in entity_cards(t, k=2).collect()}
    a = got[("PER", "a")]
    assert (a["n_docs"], a["n_out"], a["n_in"], a["n_evidence"]) \
        == (2, 3, 0, 3)
    # works (2) outranks born (1); ties on count break name-asc
    assert a["top_preds"] == "works|born"
    assert a["top_neighbors"].startswith(f"ORG{SEP}b")
    c = got[("LOC", "c")]
    assert (c["n_out"], c["n_in"]) == (0, 2)
    # k=2 cap: a has 2 distinct preds, card shows exactly both
    assert len(a["top_preds"].split("|")) == 2


def test_metapath_census_counts_and_self_exclusion(spark):
    from tildener_spark.operators.graphstats import metapath_profile
    t = _full_triples(spark, [
        # x -p-> y -q-> z  (one composable path)
        ("u1", "PER", "x", "p", "ORG", "y"),
        ("u1", "ORG", "y", "q", "LOC", "z"),
        # round trip x -p-> y -r-> x must be excluded
        ("u2", "ORG", "y", "r", "PER", "x"),
    ])
    got = {(r["pred1"], r["pred2"]): (r["n_paths"], r["n_mid"],
                                      r["n_pairs"])
           for r in metapath_profile(t, k=16).collect()}
    assert got[("p", "q")] == (1, 1, 1)
    assert ("p", "r") not in got          # self-path excluded
    # hop2 edges also start at x? none besides p — q,r only from y
    assert set(got) == {("p", "q")}


def test_metapath_hub_cap_bounds_fanout(spark):
    from tildener_spark.operators.graphstats import metapath_profile
    rows = []
    # hub mid node with 10 in-edges and 10 out-edges
    for i in range(10):
        rows.append(("u", "PER", f"in{i}", "p", "ORG", "hub"))
        rows.append(("u", "ORG", "hub", "q", "LOC", f"out{i}"))
    t = _full_triples(spark, rows)
    uncapped = metapath_profile(t, k=16).collect()[0]
    assert uncapped["n_paths"] == 100
    capped = metapath_profile(t, k=3).collect()[0]
    assert capped["n_paths"] == 9  # 3 in x 3 out


def test_bottleneck_matches_bruteforce(spark):
    from itertools import permutations

    from tildener_spark.operators.graphstats import (
        BOTTLENECK_CAP, entity_edges, graph_bottleneck)
    # weighted path diversity: direct weak edge vs stronger detour
    t = _triples(spark, (
        [("PER", "s", "ORG", "a")] * 9       # s-a: 9
        + [("PER", "s", "ORG", "b")] * 1     # s-b: 1 (weak direct)
        + [("ORG", "a", "ORG", "b")] * 5     # a-b: 5 (detour wins: 5)
        + [("ORG", "b", "LOC", "c")] * 3     # c via b: min(5,3)=3
        + [("PER", "s", "PER", "hub")] * 20  # make s the top seed? no:
    ))
    edges = entity_edges(t)
    got = {(r["ne_type"], r["canonical"]): (r["strength"], r["is_seed"])
           for r in graph_bottleneck(edges, n_seeds=1,
                                     iterations=6).collect()}
    # seed = max-mass node = s (9+1+20 = 30)
    assert got[("PER", "s")] == (BOTTLENECK_CAP, True)
    assert got[("ORG", "a")][0] == 9
    assert got[("ORG", "b")][0] == 5      # detour s->a->b beats direct 1
    assert got[("LOC", "c")][0] == 3
    assert got[("PER", "hub")][0] == 20

    # exhaustive check: max over simple paths of min edge weight
    w = {}
    for r in edges.collect():
        u, v = r["src"], r["dst"]
        w[(u, v)] = w.get((u, v), 0) + r["n_evidence"]
    und = {}
    for (u, v), ev in w.items():
        und[frozenset((u, v))] = und.get(frozenset((u, v)), 0) + ev
    nodes = sorted({n for p in und for n in p})
    seed = f"PER{SEP}s"
    for target in nodes:
        if target == seed:
            continue
        best = 0
        for k in range(1, len(nodes)):
            for mid in permutations([n for n in nodes
                                     if n not in (seed, target)], k - 1):
                path = [seed, *mid, target]
                ok = all(frozenset((a, b)) in und
                         for a, b in zip(path, path[1:]))
                if ok:
                    best = max(best, min(
                        und[frozenset((a, b))]
                        for a, b in zip(path, path[1:])))
        typ, can = target.split(SEP)
        assert got[(typ, can)][0] == best, target


def test_edge_provenance_ranks_urls(spark):
    from tildener_spark.operators.graphstats import edge_provenance
    t = _full_triples(spark, [
        ("u1", "PER", "a", "p", "ORG", "b"),
        ("u1", "PER", "a", "p", "ORG", "b"),
        ("u2", "PER", "a", "p", "ORG", "b"),
        ("u3", "PER", "a", "p", "ORG", "b"),
        ("u4", "PER", "a", "p", "ORG", "b"),
    ])
    [r] = edge_provenance(t, k=3).collect()
    assert (r["n_evidence"], r["n_docs"]) == (5, 4)
    # u1 (2 hits) first; ties at 1 hit break url-asc; k=3 cap
    assert r["top_urls"] == "u1|u2|u3"


def test_relation_conflicts_flags_functional_violations(spark):
    from tildener_spark.operators.graphstats import (
        SEP, relation_conflicts)
    rows = []
    # 'born_in' is functional: 10 subjects with 1 object, 1 with 2
    for i in range(10):
        rows.append(("u", "PER", f"p{i}", "born_in", "LOC", f"l{i}"))
    rows += [("u", "PER", "dup", "born_in", "LOC", "x"),
             ("u", "PER", "dup", "born_in", "LOC", "x"),
             ("u", "PER", "dup", "born_in", "LOC", "y")]
    # 'knows' is many-valued: every subject has 3 objects (share 0)
    for i in range(12):
        for j in range(3):
            rows.append(("u", "PER", f"k{i}", "knows",
                         "PER", f"q{j}"))
    t = _full_triples(spark, rows)
    got = relation_conflicts(t, func_share=0.8,
                             min_subjects=10).collect()
    assert len(got) == 1
    [r] = got
    assert (r["pred"], r["subj_canonical"], r["n_objs"]) \
        == ("born_in", "dup", 2)
    # x has 2 evidence hits, y 1 -> x first
    assert r["objs"] == f"LOC{SEP}x|LOC{SEP}y"


def test_relation_conflicts_min_subjects_gate(spark):
    from tildener_spark.operators.graphstats import relation_conflicts
    rows = [("u", "PER", "a", "rare", "LOC", "x"),
            ("u", "PER", "a", "rare", "LOC", "y")]
    t = _full_triples(spark, rows)
    # only 1 subject: below min_subjects, never reported
    assert relation_conflicts(t, min_subjects=10).count() == 0
