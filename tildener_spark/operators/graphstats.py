"""Entity-graph analytics over the canonical knowledge graph.

The reference pipeline stops at tagged files / harvested gazetteers
(TildeNER has no graph stage); these operators serve the KG-construct
tier's downstream consumers — entity-salience ranking and topology
stats over the nodes/edges tables that ``operators/graph.py``
materializes — and follow the engine's oracle contract (every float
surface quantized so a DuckDB replay hashes identically).

Scale design (100 TB / 10^12 docs):

* the edge list is |E|-sized but the rank/degree tables are |V|-sized
  (canonical entities, orders of magnitude smaller than mentions);
  every iteration shuffles only |V|+|E| keyed rows with map-side
  partial aggregation absorbing head-entity in-degree skew;
* PageRank's per-iteration scalar (dangling mass) is a single agg —
  the only driver-side value, O(iterations) collects total;
* the 2-hop expansion is the one genuinely quadratic-in-degree step,
  so it runs over each node's top-``k`` neighbours by evidence
  (deterministic tie-break) — fanout bounded at k per node, the same
  guard family as linking.py's ``max_bucket``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tildener_spark.materialize import materialize_once, release

SEP = "␟"  # unit-separator glyph, matches operators/graph.py


def entity_edges(canon_triples: DataFrame,
                 drop_self_loops: bool = True) -> DataFrame:
    """Canonical triples -> evidence-weighted entity edge list.

    Node id is ``ne_type SEP canonical`` (one string key so the
    iterative joins hash one column).  One partial-agg shuffle.
    """
    e = (
        canon_triples
        .groupBy("subj_type", "subj_canonical", "obj_type",
                 "obj_canonical")
        .agg(F.count(F.lit(1)).alias("n_evidence"))
    )
    if drop_self_loops:
        e = e.filter(~((F.col("subj_type") == F.col("obj_type"))
                       & (F.col("subj_canonical")
                          == F.col("obj_canonical"))))
    return e.select(
        F.concat_ws(SEP, "subj_type", "subj_canonical").alias("src"),
        F.concat_ws(SEP, "obj_type", "obj_canonical").alias("dst"),
        "n_evidence",
    )


def split_node(df: DataFrame, col: str = "node") -> DataFrame:
    """node -> (ne_type, canonical) columns (canonical may itself
    contain no SEP by construction — graph.py guarantees it)."""
    return df.withColumn(
        "ne_type", F.split(F.col(col), SEP).getItem(0),
    ).withColumn(
        "canonical", F.split(F.col(col), SEP).getItem(1),
    )


def weighted_pagerank(edges: DataFrame,
                      weight_col: str = "n_evidence",
                      iterations: int = 5,
                      damping: float = 0.85,
                      quantize: int = 9) -> DataFrame:
    """Weighted PageRank by iterative DataFrame joins over any
    ``(src, dst, weight)`` edge list -> ``(node, rank)``.

    Shared core for :func:`entity_pagerank` (KG salience) and
    ``links.host_pagerank`` (host-quality prior over the web graph).

    Semantics (the quantization is part of the operator contract, not
    an implementation detail — it is what makes the fixpoint
    replayable on any engine and any partitioning):

    * ranks start at ``round(1/N, quantize)``;
    * each iteration:
      ``round((1-d)/N + d * (sum_in(rank*w/out_w) + dangling/N),
      quantize)`` where ``dangling`` is the summed rank of nodes with
      no out-edges (redistributed uniformly, the standard correction);
    * ``rank * w/out_w`` products are exact IEEE doubles in any
      engine; only the in-sum's addition order is engine-dependent,
      and its ~1e-16 wobble is absorbed by the per-iteration
      ``round(., 9)``.

    Plan shape per iteration: one |V|x|E| equi-join on ``src`` (the
    fraction table is pre-partitioned by ``src`` once), one partial-agg
    shuffle keyed by ``dst``, one scalar agg for the dangling mass.
    Ranks are persisted and the previous iteration unpersisted so the
    lineage stays one-deep.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0)) \
            .select("node", "rank")

    out_w = edges.groupBy("src").agg(
        F.sum(weight_col).alias("out_w"))
    frac = (
        edges.join(out_w, "src")
        .select(
            "src", "dst",
            (F.col(weight_col).cast("double")
             / F.col("out_w").cast("double")).alias("frac"))
        .repartition("src")
        .persist()
    )
    src_nodes = frac.select("src").distinct().persist()
    frac.count()

    teleport = (1.0 - damping) / n
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n), quantize).alias("rank"),
    ).persist()
    ranks.count()

    spent = []
    for _ in range(iterations):
        # ONE action per iteration: the dangling-mass collect both
        # fetches the scalar and (first time through) materializes
        # the lazily-persisted rank table from the previous round,
        # whose plan is a cache-backed projection — so no job ever
        # recomputes a join.  Superseded caches are released one
        # round late so nothing in a live lineage is dropped.
        # (A broadcast-1-row-aggregate crossJoin was tried instead of
        # the collect: the unmaterialized aggregate nests the full
        # prior plan, the tree doubles per iteration, and AQE's
        # plan-string rendering OOMs — scalars that gate the NEXT
        # plan's literals belong on the driver.)
        dangling = (
            ranks.join(src_nodes, ranks.node == src_nodes.src,
                       "left_anti")
            .agg(F.sum("rank"))
            .collect()[0][0]
        ) or 0.0
        while spent:  # ranks is now materialized; older caches free
            release(spent.pop())
        contrib = (
            ranks.join(frac, ranks.node == frac.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("c"))
        )
        # materialize_once (localCheckpoint locally) also TRUNCATES
        # the logical plan: each iteration references the previous
        # rank table twice (dangling + contrib), so without
        # truncation the logical tree doubles per iteration and deep
        # runs OOM the driver's plan machinery.  On a cluster the
        # persist path keeps lineage (executor-loss recompute); for
        # deep iteration counts there, insert a reliable checkpoint
        # every ~8 rounds — same monotone-safe resumption argument
        # as graph_kcore.
        new_ranks = materialize_once(
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                nodes.node,
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0))
                       + F.lit(dangling / n)),
                    quantize,
                ).alias("rank"),
            )
        )
        spent.append(ranks)
        ranks = new_ranks
    ranks.count()
    for df in spent:
        release(df)
    out = ranks.select("node", "rank")
    for df in (nodes, frac, src_nodes):
        df.unpersist()
    return out


def entity_pagerank(edges: DataFrame, iterations: int = 5,
                    damping: float = 0.85,
                    quantize: int = 9) -> DataFrame:
    """Evidence-weighted entity-salience PageRank over the canonical
    KG edge list (:func:`entity_edges`) -> (ne_type, canonical,
    rank).  Thin wrapper over :func:`weighted_pagerank`."""
    pr = weighted_pagerank(edges, "n_evidence", iterations, damping,
                           quantize)
    return split_node(pr).select("ne_type", "canonical", "rank")


def personalized_pagerank(edges: DataFrame, n_seeds: int = 3,
                          iterations: int = 5,
                          damping: float = 0.85,
                          quantize: int = 9) -> DataFrame:
    """Personalized PageRank: random-walk-with-restart relatedness to
    the hub-entity seed set (Jeh & Widom 2003) -> (ne_type,
    canonical, rank, is_seed).  The KG query behind "entities most
    related to the graph's core": unlike global PageRank, teleport
    (and dangling mass) returns ONLY to the seeds, so rank decays
    with walk distance from them.

    Seeds are the ``n_seeds`` nodes with the largest total incident
    evidence mass, tie-break lexicographically smallest node — the
    same fully-data-derived rule as :func:`graph_bfs`, so the query
    is deterministic with no free parameters.  Seed mass sums are
    integer (n_evidence), making seed selection engine-exact.

    Determinism contract (the weighted_pagerank family): ranks start
    at ``round(1/|S|, quantize)`` on seeds and 0 elsewhere; per
    iteration ``round(seed_teleport + d * (in_sum + seed_dangling),
    quantize)`` where ``seed_teleport = (1-d)/|S|`` and the dangling
    mass is redistributed over the seeds only.  Products/divisions
    are IEEE-identical cross-engine; the in-sum's addition-order
    wobble is absorbed by the per-iteration round, so the DuckDB
    unrolled-CTE replay hashes bitwise.

    Scale shape: identical to :func:`weighted_pagerank` — |V|+|E|
    keyed shuffles per iteration, one scalar collect (dangling), the
    seed table broadcast-sized by construction.
    """
    mass = (edges.select("src", F.col("n_evidence").alias("w"))
            .union(edges.select(F.col("dst").alias("src"),
                                F.col("n_evidence").alias("w")))
            .groupBy("src").agg(F.sum("w").alias("mass")))
    seeds = (mass.orderBy(F.desc("mass"), F.asc("src"))
             .limit(n_seeds)
             .select(F.col("src").alias("node"))
             .persist())
    n_s = seeds.count()
    if n_s == 0:
        return split_node(seeds).select(
            "ne_type", "canonical",
            F.lit(0.0).alias("rank"), F.lit(False).alias("is_seed"))

    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(seeds.withColumnRenamed("node", "s"),
              F.col("node") == F.col("s"), "left")
        .select("node", F.col("s").isNotNull().alias("is_seed"))
        .persist()
    )
    out_w = edges.groupBy("src").agg(
        F.sum("n_evidence").alias("out_w"))
    frac = (
        edges.join(out_w, "src")
        .select("src", "dst",
                (F.col("n_evidence").cast("double")
                 / F.col("out_w").cast("double")).alias("frac"))
        .repartition("src")
        .persist()
    )
    src_nodes = frac.select("src").distinct().persist()
    frac.count()

    teleport = (1.0 - damping) / n_s
    ranks = nodes.select(
        "node", "is_seed",
        F.when(F.col("is_seed"),
               F.round(F.lit(1.0 / n_s), quantize))
        .otherwise(F.lit(0.0)).alias("rank")).persist()
    spent = []
    for _ in range(iterations):
        dangling = (
            ranks.join(src_nodes, ranks.node == src_nodes.src,
                       "left_anti")
            .agg(F.sum("rank"))
            .collect()[0][0]
        ) or 0.0
        while spent:
            release(spent.pop())
        contrib = (
            ranks.join(frac, ranks.node == frac.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("c"))
        )
        # materialize_once truncates the per-iteration logical plan
        # (see weighted_pagerank) — deep relatedness runs (12+
        # restarts) would otherwise double the tree per round
        new_ranks = materialize_once(
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                nodes.node, nodes.is_seed,
                F.round(
                    F.when(nodes.is_seed,
                           F.lit(teleport + damping * dangling / n_s))
                    .otherwise(F.lit(0.0))
                    + F.lit(damping)
                    * F.coalesce(F.col("c"), F.lit(0.0)),
                    quantize,
                ).alias("rank"),
            )
        )
        spent.append(ranks)
        ranks = new_ranks
    ranks.count()
    for df in spent:
        release(df)
    out = split_node(ranks).select(
        "ne_type", "canonical", "rank", "is_seed")
    out = out.localCheckpoint(eager=True)
    for df in (seeds, nodes, frac, src_nodes):
        df.unpersist()
    release(ranks)
    return out


def entity_timeline(canon_triples: DataFrame,
                    pages: DataFrame) -> DataFrame:
    """Per-entity temporal profile from crawl timestamps.

    Joins every triple endpoint back to its page's ``warc_ts`` and
    aggregates per canonical entity: first/last crawl sighting,
    distinct pages, and total endpoint occurrences.  This is the
    freshness signal a KG consumer uses to age out stale entities.

    Scale shape: the endpoint projection is 2|triples| rows with two
    columns; the equi-join on ``url`` is shuffle-hash (both sides
    large at crawl scale, co-partitioned on url), and the final agg
    is one partial-agg shuffle keyed by entity — head entities are
    absorbed map-side.
    """
    endpoints = (
        canon_triples.select(
            F.col("subj_type").alias("ne_type"),
            F.col("subj_canonical").alias("canonical"), "url")
        .union(canon_triples.select(
            F.col("obj_type").alias("ne_type"),
            F.col("obj_canonical").alias("canonical"), "url"))
    )
    return (
        endpoints.join(pages.select("url", "warc_ts"), "url")
        .groupBy("ne_type", "canonical")
        .agg(F.min("warc_ts").alias("first_seen"),
             F.max("warc_ts").alias("last_seen"),
             F.countDistinct("url").alias("n_pages"),
             F.count(F.lit(1)).cast("long").alias("n_endpoints"))
    )


def edge_timeline(canon_triples: DataFrame,
                  pages: DataFrame) -> DataFrame:
    """Per-EDGE temporal profile: when each distinct
    (subj, pred, obj) relation was first/last observed in the crawl,
    across how many documents, and its active span.

    The relation-level freshness signal (complement of
    :func:`entity_timeline`'s node view): KG curation ages out edges
    whose last sighting is stale, and a wide first→last span with
    many distinct docs separates durable facts from one-crawl noise.

    ``span_s`` is ``epoch(last) - epoch(first)`` in whole seconds —
    integer-exact on both engines (no date-boundary/timezone
    arithmetic, unlike day diffs).

    Scale shape: one url-keyed shuffle-hash equi-join (both sides
    crawl-scale, co-partitioned), then one partial-agg shuffle keyed
    by the 5-column edge identity — head edges absorbed map-side.
    """
    j = canon_triples.select(
        "subj_type", "subj_canonical", "pred",
        "obj_type", "obj_canonical", "url") \
        .join(pages.select("url", "warc_ts"), "url")
    return (
        j.groupBy("subj_type", "subj_canonical", "pred",
                  "obj_type", "obj_canonical")
        .agg(F.min("warc_ts").alias("first_seen"),
             F.max("warc_ts").alias("last_seen"),
             F.countDistinct("url").alias("n_docs"),
             F.count(F.lit(1)).cast("long").alias("n_evidence"),
             (F.max(F.unix_timestamp("warc_ts"))
              - F.min(F.unix_timestamp("warc_ts")))
             .cast("long").alias("span_s"))
    )


def predicate_profile(canon_triples: DataFrame) -> DataFrame:
    """Per-predicate type-signature profile — lightweight KG schema
    induction: for every predicate, its volume, distinct entity-pair
    count, how many (subj_type, obj_type) signatures it appears
    with, and the dominant signature with its share.

    A curator reads this as the relation's implied schema ("vadi:
    PER→ORG at 0.96 share") and flags low-share predicates as
    extraction noise or genuine polysemy.

    Determinism: all counts integer; the dominant signature is the
    (count desc, subj_type asc, obj_type asc) argmax — a total
    order; the share is one ``round(n_sig/n_triples, 6)`` division.

    Scale shape: one (pred, types)-keyed partial agg (signature
    space is tiny — |preds| × |types|²), one pred-keyed rollup, one
    argmax window over the signature table (vocabulary-sized, never
    corpus-sized).
    """
    sig = (canon_triples
           .groupBy("pred", "subj_type", "obj_type")
           .agg(F.count(F.lit(1)).alias("n_sig")))
    per_pred = (canon_triples.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("subj_canonical", "obj_canonical")
        .cast("long").alias("n_pairs")))
    w = Window.partitionBy("pred").orderBy(
        F.desc("n_sig"), F.asc("subj_type"), F.asc("obj_type"))
    top = (sig
           .withColumn("rn", F.row_number().over(w))
           .withColumn("n_signatures",
                       F.count(F.lit(1)).over(
                           Window.partitionBy("pred")))
           .filter(F.col("rn") == 1)
           .select("pred",
                   F.col("n_signatures").cast("long"),
                   F.col("subj_type").alias("top_subj_type"),
                   F.col("obj_type").alias("top_obj_type"),
                   F.col("n_sig").cast("long").alias("top_sig_n")))
    return (per_pred.join(top, "pred")
            .withColumn("top_sig_share",
                        F.round(F.col("top_sig_n").cast("double")
                                / F.col("n_triples").cast("double"),
                                6))
            .select("pred", "n_triples", "n_pairs", "n_signatures",
                    "top_subj_type", "top_obj_type", "top_sig_n",
                    "top_sig_share"))


def entity_cards(canon_triples: DataFrame, k: int = 5) -> DataFrame:
    """Per-entity summary card — the "entity page" a KG consumer
    renders: degree split by direction, document support, total
    evidence, and the top-k predicates and neighbour entities as
    deterministic ``|``-joined lists.

    Determinism: every top-k is the (count desc, name asc) prefix of
    a total order, and the joined string concatenates in rank order
    via ``sort_array`` over (rank, name) structs — no
    ``collect_list`` ordering dependence anywhere.

    Scale shape: three keyed partial aggs off one endpoints table
    ((entity), (entity, pred), (entity, neighbour)) plus two
    vocabulary-bounded top-k windows; the heavy inputs are
    |triples|-sized with map-side combine, the windows run over at
    most |V| x |preds| / |E| distinct rows.  No per-entity fanout is
    unbounded: the card keeps k rows per entity by construction.
    """
    ends = canon_triples.select(
        F.concat_ws(SEP, "subj_type", "subj_canonical").alias("node"),
        F.concat_ws(SEP, "obj_type", "obj_canonical").alias("other"),
        "pred", "url", F.lit(1).alias("is_out"),
    ).unionByName(canon_triples.select(
        F.concat_ws(SEP, "obj_type", "obj_canonical").alias("node"),
        F.concat_ws(SEP, "subj_type", "subj_canonical").alias("other"),
        "pred", "url", F.lit(0).alias("is_out"),
    ))

    base = ends.groupBy("node").agg(
        F.countDistinct("url").cast("long").alias("n_docs"),
        F.sum("is_out").cast("long").alias("n_out"),
        F.sum(1 - F.col("is_out")).cast("long").alias("n_in"),
        F.count(F.lit(1)).cast("long").alias("n_evidence"),
    )

    def topk_join(key_col: str, alias: str) -> DataFrame:
        cnt = ends.groupBy("node", key_col).agg(
            F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("node").orderBy(
            F.desc("c"), F.asc(key_col))
        return (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .groupBy("node")
            .agg(F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(
                        F.struct("rn", F.col(key_col).alias("v")))),
                    lambda s: s["v"]),
                "|").alias(alias))
        )

    return (
        base
        .join(topk_join("pred", "top_preds"), "node")
        .join(topk_join("other", "top_neighbors"), "node")
        .select(
            F.split_part("node", F.lit(SEP), F.lit(1))
            .alias("ne_type"),
            F.split_part("node", F.lit(SEP), F.lit(2))
            .alias("canonical"),
            "n_docs", "n_out", "n_in", "n_evidence",
            "top_preds", "top_neighbors")
    )


def metapath_profile(canon_triples: DataFrame,
                     k: int = 16) -> DataFrame:
    """Two-hop metapath census — for every predicate pair (p1, p2),
    how many x -p1-> y -p2-> z paths the KG contains, through how
    many distinct mid entities, reaching how many distinct (x, z)
    pairs.  The schema-induction companion to
    :func:`predicate_profile`: high-volume metapaths are the join
    patterns worth materializing or indexing.

    Scale shape: the mid-entity join is the one quadratic-in-degree
    step, so both sides are capped at the top-``k`` distinct edges
    per mid entity by (evidence desc, pred asc, partner asc) — the
    same hub guard as the 2-hop expansion in
    :func:`graph_degree_stats`; fanout is bounded at k^2 per mid
    entity and the output is |preds|^2-sized.  Self-paths (x == z)
    are excluded: x -p1-> y -p2-> x round trips say nothing about
    composable relations.
    """
    e = (canon_triples
         .groupBy("subj_type", "subj_canonical", "pred",
                  "obj_type", "obj_canonical")
         .agg(F.count(F.lit(1)).alias("w"))
         .select(
             F.concat_ws(SEP, "subj_type", "subj_canonical")
             .alias("src"),
             "pred",
             F.concat_ws(SEP, "obj_type", "obj_canonical")
             .alias("dst"),
             "w"))
    w_in = Window.partitionBy("dst").orderBy(
        F.desc("w"), F.asc("pred"), F.asc("src"))
    w_out = Window.partitionBy("src").orderBy(
        F.desc("w"), F.asc("pred"), F.asc("dst"))
    first = (e.withColumn("rn", F.row_number().over(w_in))
             .filter(F.col("rn") <= k)
             .select(F.col("src").alias("x"),
                     F.col("pred").alias("pred1"),
                     F.col("dst").alias("mid")))
    second = (e.withColumn("rn", F.row_number().over(w_out))
              .filter(F.col("rn") <= k)
              .select(F.col("src").alias("mid"),
                      F.col("pred").alias("pred2"),
                      F.col("dst").alias("z")))
    paths = (first.join(second, "mid")
             .filter(F.col("x") != F.col("z")))
    return (paths.groupBy("pred1", "pred2").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths"),
        F.countDistinct("mid").cast("long").alias("n_mid"),
        F.countDistinct("x", "z").cast("long").alias("n_pairs"))
    )


def kg_snapshot_asof(canon_triples: DataFrame,
                     pages: DataFrame) -> DataFrame:
    """Temporal KG snapshot: the edge set as of the corpus midpoint
    timestamp — only evidence fetched at or before the cutoff counts,
    edges first sighted later are absent — plus each edge's share of
    its final evidence, the "how much of today's KG existed at time
    T" view behind freshness dashboards and retro-evaluations.

    The cutoff is the integer-millisecond midpoint of (min, max)
    fetch time: ONE partial min/max aggregate broadcast back — never
    a global sort or rank over the page table (a percentile cutoff
    would scan-and-sort the corpus; as-of semantics are naturally
    parameterized by a timestamp, so the snapshot rule must stay
    O(agg)).  Floor-divided so both engines truncate identically.

    Scale shape: one url-keyed co-partitioned join (triples ⋈ page
    timestamps), two edge-keyed partial aggs, one broadcast of the
    1-row cutoff.
    """
    ms = lambda c: F.unix_millis(  # noqa: E731
        F.col(c).cast("timestamp_ltz"))
    cut = pages.agg(
        F.min("warc_ts").alias("t0"), F.max("warc_ts").alias("t1"),
    ).select(
        F.floor((ms("t0") + ms("t1")) / 2).cast("long")
        .alias("cut_ms"))
    edge = ["subj_type", "subj_canonical", "pred",
            "obj_type", "obj_canonical"]
    tr = (canon_triples
          .join(pages.select("url", "warc_ts"), "url")
          .crossJoin(F.broadcast(cut)))
    tot = tr.groupBy(*edge).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"))
    asof = (tr.filter(ms("warc_ts") <= F.col("cut_ms"))
            .groupBy(*edge)
            .agg(F.count(F.lit(1)).cast("long")
                 .alias("n_evidence_asof"),
                 F.countDistinct("url").cast("long")
                 .alias("n_docs_asof")))
    return (asof.join(tot, edge).select(
        *edge, "n_evidence_asof", "n_docs_asof", "n_total",
        F.round(F.col("n_evidence_asof").cast("double")
                / F.col("n_total").cast("double"), 6)
        .alias("share_of_final")))


def edge_provenance(canon_triples: DataFrame, k: int = 3) -> DataFrame:
    """Per-edge provenance card: every distinct canonical relation
    with its evidence volume, document support, and the top-k
    supporting urls as a rank-ordered list — the "why do we believe
    this edge" lookup a KG consumer audits against.

    Determinism: the url list is the (count desc, url asc) top-k
    prefix concatenated in rank order via sorted structs (the
    entity_cards recipe).  Scale shape: one (edge, url)-keyed partial
    agg + one edge-keyed rollup + one top-k window over the
    (edge, url) table — all bounded by evidence volume with map-side
    combine, never wider than the triple stream.
    """
    by_url = (canon_triples
              .groupBy("subj_type", "subj_canonical", "pred",
                       "obj_type", "obj_canonical", "url")
              .agg(F.count(F.lit(1)).alias("c")))
    edge_cols = ["subj_type", "subj_canonical", "pred",
                 "obj_type", "obj_canonical"]
    w = Window.partitionBy(*edge_cols).orderBy(
        F.desc("c"), F.asc("url"))
    top = (by_url.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= k)
           .groupBy(*edge_cols)
           .agg(F.array_join(
               F.transform(
                   F.sort_array(F.collect_list(
                       F.struct("rn", F.col("url").alias("v")))),
                   lambda s: s["v"]),
               "|").alias("top_urls")))
    totals = (by_url.groupBy(*edge_cols).agg(
        F.sum("c").cast("long").alias("n_evidence"),
        F.count(F.lit(1)).cast("long").alias("n_docs")))
    return totals.join(top, edge_cols).select(
        *edge_cols, "n_evidence", "n_docs", "top_urls")


def relation_conflicts(canon_triples: DataFrame,
                       func_share: float = 0.8,
                       min_subjects: int = 10,
                       k: int = 5) -> DataFrame:
    """Functional-dependency conflict report: for predicates that are
    empirically functional (>= ``func_share`` of subjects carry
    exactly one distinct object, over >= ``min_subjects`` subjects),
    emit the violating subjects with their conflicting object set —
    the extraction-error / genuine-ambiguity triage list.

    Determinism: integer counts decide functionality (share compared
    as n_single * 10^6 >= func_share * 10^6 * n_subjects — integer
    cross-multiplication, no float division at the decision); the
    object list is (evidence desc, obj asc) top-k rank-ordered.
    Scale shape: all aggregations are keyed partial aggs over
    (pred, subj[, obj]) — vocabulary-bounded outputs, with map-side
    combine absorbing head predicates.
    """
    thr = int(round(func_share * 1_000_000))
    per_subj = (canon_triples
                .groupBy("pred", "subj_type", "subj_canonical")
                .agg(F.countDistinct("obj_type", "obj_canonical")
                     .alias("n_objs")))
    per_pred = (per_subj.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum(F.when(F.col("n_objs") == 1, 1).otherwise(0))
        .alias("n_single")))
    functional = per_pred.filter(
        (F.col("n_subjects") >= min_subjects)
        & (F.col("n_single") * F.lit(1_000_000)
           >= F.col("n_subjects") * F.lit(thr))).select("pred")
    viol = (per_subj.join(F.broadcast(functional), "pred")
            .filter(F.col("n_objs") >= 2))
    obj_ev = (canon_triples
              .groupBy("pred", "subj_type", "subj_canonical",
                       "obj_type", "obj_canonical")
              .agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy("pred", "subj_type", "subj_canonical") \
        .orderBy(F.desc("c"), F.asc("obj_type"),
                 F.asc("obj_canonical"))
    objs = (obj_ev.join(
        viol.select("pred", "subj_type", "subj_canonical"),
        ["pred", "subj_type", "subj_canonical"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("pred", "subj_type", "subj_canonical")
        .agg(F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct(
                    "rn",
                    F.concat_ws(SEP, "obj_type", "obj_canonical")
                    .alias("v")))),
                lambda s: s["v"]),
            "|").alias("objs")))
    return (viol.join(objs, ["pred", "subj_type", "subj_canonical"])
            .select("pred", "subj_type", "subj_canonical",
                    F.col("n_objs").cast("long").alias("n_objs"),
                    "objs"))


def entity_communities(edges: DataFrame,
                       iterations: int = 4) -> DataFrame:
    """Deterministic synchronous label propagation over the
    evidence-weighted undirected entity graph.

    Each node starts labeled with its own id; every iteration each
    node adopts the label carrying the largest total incident edge
    weight among its neighbours' PREVIOUS labels, ties broken by
    lexicographically smallest label.  Synchronous updates + integer
    weights + a total tie-break make the fixpoint identical on any
    engine and any partitioning (the same replayability contract as
    ``entity_pagerank``, with no float at all).

    Plan shape per iteration: one |E| join on ``dst`` against the
    |V| label table, one partial-agg shuffle keyed by
    ``(src, label)``, one window argmax per node.
    """
    und = (
        edges.select("src", "dst", "n_evidence")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"), "n_evidence"))
        .groupBy("src", "dst")
        .agg(F.sum("n_evidence").alias("w"))
        .persist()
    )
    und.count()
    labels = und.select(F.col("src").alias("node")).distinct() \
        .withColumn("label", F.col("node")).persist()
    labels.count()

    w_rank = Window.partitionBy("src").orderBy(
        F.col("sw").desc(), F.col("label").asc())
    for _ in range(iterations):
        new_labels = (
            und.join(labels, und.dst == labels.node)
            .groupBy("src", "label")
            .agg(F.sum("w").alias("sw"))
            .withColumn("rn", F.row_number().over(w_rank))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("node"), "label")
            .persist()
        )
        new_labels.count()
        labels.unpersist()
        labels = new_labels

    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("community_size"))
    out = split_node(labels).join(sizes, "label").select(
        "ne_type", "canonical",
        F.col("label").alias("community"), "community_size")
    und.unpersist()
    return out


BOTTLENECK_CAP = 1 << 40  # seed strength sentinel (> any evidence)


def graph_bottleneck(edges: DataFrame, n_seeds: int = 3,
                     iterations: int = 6) -> DataFrame:
    """Max-bottleneck (widest-path) connection strength from the
    evidence-mass hub seeds: for every reachable node, the maximum
    over paths of the MINIMUM edge evidence along the path — "how
    strong is this entity's strongest chain of evidence to a hub".
    The all-integer companion to personalized PageRank: no float,
    no quantization, the fixpoint replays exactly.

    Dynamics: ``strength(v) = max(strength(v), max over incident
    (u, w) of min(strength(u), w))`` with seeds pinned at
    ``BOTTLENECK_CAP``; strengths are monotone nondecreasing, so a
    fixed ``iterations`` unroll is a sound under-approximation that
    equals the fixpoint once the graph's bottleneck diameter is
    covered (6 hops on a linked-entity graph; the oracle unrolls the
    same count).  Nodes not reached within the horizon are absent.

    Plan shape per iteration: one |E| join on ``dst`` against the
    frontier table + one node-keyed max partial-agg — same cost
    class as a pagerank step, materialized once per round so the
    logical plan stays linear in rounds.
    """
    und = (
        edges.select("src", "dst", "n_evidence")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"), "n_evidence"))
        .groupBy("src", "dst")
        .agg(F.sum("n_evidence").alias("w"))
        .persist()
    )
    und.count()
    mass = und.groupBy("src").agg(F.sum("w").alias("mass"))
    seeds = (mass
             .withColumn("srk", F.row_number().over(
                 Window.orderBy(F.desc("mass"), F.asc("src"))))
             .filter(F.col("srk") <= n_seeds)
             .select(F.col("src").alias("node")))
    f = seeds.select(
        "node", F.lit(BOTTLENECK_CAP).cast("long").alias("strength"),
    ).persist()
    f.count()
    for _ in range(iterations):
        relax = (
            und.join(f, und.dst == f.node)
            .select(und.src.alias("node"),
                    F.least("strength", "w").cast("long")
                    .alias("strength"))
        )
        nxt = (f.unionByName(relax)
               .groupBy("node")
               .agg(F.max("strength").alias("strength"))
               .persist())
        nxt.count()
        f.unpersist()
        f = nxt
    out = split_node(f).select(
        "ne_type", "canonical", F.col("strength").cast("long")
        .alias("strength"),
        (F.col("strength") == BOTTLENECK_CAP).alias("is_seed"))
    und.unpersist()
    return out


def graph_triangles(edges: DataFrame, k: int = 16) -> DataFrame:
    """Per-entity triangle count and local clustering coefficient
    over the MUTUAL top-``k`` graph.

    The adjacency is first capped at each node's top-``k`` neighbours
    by evidence (ties by neighbour id), then symmetrized by
    INTERSECTION — an edge survives only if each endpoint keeps the
    other.  Mutual-top-k bounds every degree at k, so the triangle
    join is at most k|V| x k|V| on a key with fanout <= k: the same
    hub-skew guard family as ``graph_degree_stats``, and the
    coefficient stays well-defined (degree = mutual degree).

    ``clustering = round(2T / (d(d-1)), 9)`` (0 when d < 2); the
    division is one IEEE op per row, deterministic everywhere.
    """
    und = (
        edges.select("src", "dst", "n_evidence")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"), "n_evidence"))
        .groupBy("src", "dst")
        .agg(F.sum("n_evidence").alias("w"))
    )
    top = und.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("src").orderBy(
                F.col("w").desc(), F.col("dst"))),
    ).filter(F.col("rn") <= k).select("src", "dst")
    mutual = (
        top.alias("a")
        .join(top.alias("b"),
              (F.col("a.src") == F.col("b.dst"))
              & (F.col("a.dst") == F.col("b.src")))
        .select(F.col("a.src").alias("src"),
                F.col("a.dst").alias("dst"))
        .persist()
    )
    mutual.count()

    mdeg = mutual.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("m_deg"))
    # each undirected mutual edge once, oriented src < dst
    e = mutual.filter(F.col("src") < F.col("dst"))
    tri = (
        e.alias("ab")
        .join(e.alias("bc"), F.col("ab.dst") == F.col("bc.src"))
        .join(e.alias("ac"),
              (F.col("ac.src") == F.col("ab.src"))
              & (F.col("ac.dst") == F.col("bc.dst")))
        .select(F.col("ab.src").alias("a"),
                F.col("ab.dst").alias("b"),
                F.col("bc.dst").alias("c"))
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("src"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    stats = (
        mdeg.join(per_node, "src", "left")
        .select(
            "src", "m_deg",
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.when(
                F.col("m_deg") >= 2,
                F.round(
                    2.0 * F.coalesce("n_tri", F.lit(0))
                    / (F.col("m_deg") * (F.col("m_deg") - 1)), 9),
            ).otherwise(F.lit(0.0)).alias("clustering"),
        )
    )
    out = split_node(stats.withColumnRenamed("src", "node")).select(
        "ne_type", "canonical", "m_deg", "n_tri", "clustering")
    mutual.unpersist()
    return out


def graph_degree_stats(edges: DataFrame, k: int = 16) -> DataFrame:
    """Per-entity topology: directed degrees, undirected degree /
    evidence mass, and the size of the distinct 2-hop neighbourhood
    computed over each node's top-``k`` neighbours by evidence
    (ties broken by neighbour id — deterministic under any
    partitioning).  The cap is the hub-skew guard: without it a
    head entity with in-degree D costs D^2 in the self-join.
    """
    und = (
        edges.select("src", "dst", "n_evidence")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"), "n_evidence"))
        .groupBy("src", "dst")
        .agg(F.sum("n_evidence").alias("w"))
        .persist()
    )
    out_deg = edges.groupBy("src").agg(
        F.countDistinct("dst").alias("out_deg"))
    in_deg = edges.groupBy("dst").agg(
        F.countDistinct("src").alias("in_deg"))
    deg = und.groupBy("src").agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum("w").alias("evidence"))

    top = und.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("src").orderBy(
                F.col("w").desc(), F.col("dst"))),
    ).filter(F.col("rn") <= k).select("src", "dst")
    hop2 = (
        top.alias("a")
        .join(top.alias("b"), F.col("a.dst") == F.col("b.src"))
        .filter(F.col("b.dst") != F.col("a.src"))
        .select(F.col("a.src").alias("src"),
                F.col("b.dst").alias("nbr"))
        .union(top.select("src", F.col("dst").alias("nbr")))
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n_2hop"))
    )

    stats = (
        deg
        .join(out_deg, "src", "left")
        .join(in_deg, deg.src == in_deg.dst, "left")
        .drop("dst")
        .join(hop2, "src", "left")
        .select(
            "src",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            "degree", "evidence",
            F.coalesce("n_2hop", F.lit(0)).alias("n_2hop"),
        )
    )
    res = split_node(stats.withColumnRenamed("src", "node")).select(
        "ne_type", "canonical", "out_deg", "in_deg",
        "degree", "evidence", "n_2hop")
    return res


def graph_bfs(edges: DataFrame, n_seeds: int = 3,
              max_hops: int = 4) -> DataFrame:
    """Multi-source BFS shortest hop-distance over the undirected
    entity graph — the KG path query ("everything within k hops of
    the hub entities") behind neighborhood exports and entity-card
    rendering.

    Seeds are the ``n_seeds`` nodes with the largest total incident
    evidence mass (tie-break: lexicographically smallest node), so
    the query is fully data-derived and deterministic.  Returns
    (ne_type, canonical, dist) for every node reached within
    ``max_hops`` (dist = hops to the NEAREST seed; unreached nodes
    are absent by contract).

    Scale shape: textbook frontier BFS — per hop one |frontier ⋈ E|
    equi-join, a frontier ``distinct``, and an anti-join against the
    visited set; state is the visited table (|V| max).  Frontiers are
    persisted per hop (iterative-plan lineage discipline, see
    entity_communities).  Hub skew lands in the frontier join where
    AQE's skew-join splitting absorbs it — distances, unlike the
    top-k-capped triangle counts, cannot be truncated without
    changing the answer, so no per-node cap is applied.
    """
    und = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .distinct().persist())
    mass = (edges.select("src", F.col("n_evidence").alias("w"))
            .union(edges.select(F.col("dst").alias("src"),
                                F.col("n_evidence").alias("w")))
            .groupBy("src").agg(F.sum("w").alias("mass")))
    dist = (mass.orderBy(F.desc("mass"), F.asc("src"))
            .limit(n_seeds)
            .select(F.col("src").alias("node"),
                    F.lit(0).alias("dist"))
            .persist())
    frontier = dist.select("node")
    spent = []
    for h in range(1, max_hops + 1):
        # one action per hop: the early-exit count doubles as the
        # materializer for the frontier AND the lazily-persisted
        # cumulative dist union; superseded caches are released one
        # round late so nothing in a live lineage is dropped
        nxt = (frontier.alias("f")
               .join(und.alias("a"), F.col("f.node") == F.col("a.src"))
               .select(F.col("a.dst").alias("node"))
               .distinct()
               .join(dist, "node", "left_anti")
               .select("node", F.lit(h).alias("dist"))
               .persist())
        if nxt.count() == 0:
            nxt.unpersist()
            break
        new_dist = dist.union(nxt).persist()
        spent.append(dist)
        dist, frontier = new_dist, nxt.select("node")
    out = split_node(dist).select("ne_type", "canonical", "dist")
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    for df in spent:
        df.unpersist()
    dist.unpersist()
    return out


def link_prediction(edges: DataFrame, k: int = 16,
                    top_n: int = 100) -> DataFrame:
    """Topological link prediction over the mutual top-``k`` entity
    graph: rank NON-edges by common-neighbour evidence — the KG-
    completion query behind "suggested relation" review queues
    (Liben-Nowell & Kleinberg 2003; RA index from Zhou et al. 2009).

    For every unordered pair (a, b) that shares >= 1 common
    neighbour but has NO edge, emits:

    * ``n_common``   — common-neighbour count,
    * ``ra_q``       — Resource-Allocation index, integer-exact:
                       sum over common z of ``10^12 div m_deg(z)``
                       (bigint floor-division per term, so the sum is
                       order-independent and replays bitwise on any
                       engine/partitioning — the quantization family
                       of weighted_pagerank),
    * ``jaccard``    — round(n_common / (deg_a + deg_b - n_common), 9)
                       (one IEEE division of integers per row).

    Top ``top_n`` by (ra_q desc, n_common desc, pair id) — a
    TakeOrderedAndProject, never a global sort.

    Scale shape: the adjacency is capped at mutual top-``k`` first
    (same hub guard as graph_triangles), so the wedge join
    z -> (a, b) has fanout <= k(k-1)/2 per node — candidate volume is
    O(k^2 |V|), never quadratic in a hub's true degree.  All floats
    are quantized, so the DuckDB oracle hashes identically.
    """
    und = (
        edges.select("src", "dst", "n_evidence")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"), "n_evidence"))
        .groupBy("src", "dst")
        .agg(F.sum("n_evidence").alias("w"))
    )
    top = und.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("src").orderBy(
                F.col("w").desc(), F.col("dst"))),
    ).filter(F.col("rn") <= k).select("src", "dst")
    mutual = (
        top.alias("a")
        .join(top.alias("b"),
              (F.col("a.src") == F.col("b.dst"))
              & (F.col("a.dst") == F.col("b.src")))
        .select(F.col("a.src").alias("src"),
                F.col("a.dst").alias("dst"))
        .persist()
    )
    mutual.count()
    mdeg = mutual.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("m_deg"))
    # wedges through each common neighbour z: z's adjacency joined
    # with itself, oriented a < b so each pair counts once per z
    adj = mutual.join(mdeg, "src").select(
        F.col("src").alias("z"), F.col("dst").alias("nb"),
        F.expr("1000000000000L div m_deg").alias("ra_term"))
    pairs = (
        adj.alias("l")
        .join(adj.alias("r"), F.col("l.z") == F.col("r.z"))
        .filter(F.col("l.nb") < F.col("r.nb"))
        .groupBy(F.col("l.nb").alias("a"), F.col("r.nb").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"),
             F.sum(F.col("l.ra_term")).cast("long").alias("ra_q"))
    )
    existing = mutual.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b"))
    cand = (
        pairs.join(existing, ["a", "b"], "left_anti")
        .join(mdeg.select(F.col("src").alias("a"),
                          F.col("m_deg").alias("deg_a")), "a")
        .join(mdeg.select(F.col("src").alias("b"),
                          F.col("m_deg").alias("deg_b")), "b")
        .select(
            "a", "b", "n_common", "ra_q",
            F.round(
                F.col("n_common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")),
                9).alias("jaccard"))
        .orderBy(F.col("ra_q").desc(), F.col("n_common").desc(),
                 "a", "b")
        .limit(top_n)
    )
    out = cand.select(
        F.split("a", SEP).getItem(0).alias("ne_type_a"),
        F.split("a", SEP).getItem(1).alias("canonical_a"),
        F.split("b", SEP).getItem(0).alias("ne_type_b"),
        F.split("b", SEP).getItem(1).alias("canonical_b"),
        "n_common", "ra_q", "jaccard")
    mutual.unpersist()
    return out


def graph_kcore(edges: DataFrame, k: int = 3,
                max_rounds: int = 8) -> DataFrame:
    """k-core of the undirected entity graph: iteratively peel nodes
    of degree < ``k`` until fixpoint — the standard dense-subgraph
    backbone extractor (Seidman 1983).  In KG curation the k-core is
    the "well-evidenced center" of the graph: entities kept after
    peeling have >= k distinct co-mention partners that themselves
    survive, so hapax co-occurrences and star fringes fall away.

    Returns (ne_type, canonical, core_deg) for nodes in the k-core,
    where ``core_deg`` is the node's degree within the core subgraph
    (>= k by the fixpoint property).

    Semantics contract: the result is the subgraph after at most
    ``max_rounds`` peeling rounds (with early exit at fixpoint).
    Peeling is monotone — extra rounds after fixpoint are no-ops —
    so an engine that always runs ``max_rounds`` rounds (the DuckDB
    oracle's unrolled-CTE replay) computes the identical set; the
    final ``>= k`` filter makes the not-yet-converged truncation
    explicit on both sides.  Everything is integer set algebra: no
    quantization needed anywhere.

    Scale shape per round: one partial-agg shuffle for degrees
    (|E'| rows, shrinking monotonically) and two semi-joins to
    restrict the edge set — both on the same key the degree agg
    used, so AQE coalesces them; the surviving-node table is the
    broadcast side once peeling bites.  Rounds needed in practice ~
    graph diameter of the fringe, bounded by ``max_rounds``
    (production reruns with a higher bound if the fixpoint flag says
    unconverged — monotonicity makes resumption safe).
    """
    e = (edges.select("src", "dst")
         .union(edges.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
         .distinct().persist())
    n_edges = e.count()
    for _ in range(max_rounds):
        # one action per round: nxt.count() (the fixpoint probe)
        # materializes the lazily-persisted survivor set en route
        survivors = materialize_once(
            e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select(F.col("src").alias("node")))
        # materialize_once truncates each round's plan (the edge set
        # is referenced three times per round, so lineage would grow
        # 3^rounds without it)
        nxt = materialize_once(
            e.join(survivors.withColumnRenamed("node", "src"), "src")
            .join(survivors.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst"))
        n_next = nxt.count()
        release(e)
        release(survivors)
        if n_next == n_edges:
            e = nxt
            break
        e, n_edges = nxt, n_next
    deg = (e.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("core_deg"))
        .filter(F.col("core_deg") >= k)
        .withColumnRenamed("src", "node"))
    out = split_node(deg).select("ne_type", "canonical", "core_deg")
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


def graph_hits(edges: DataFrame, iterations: int = 5,
               quantize: int = 9) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    evidence-weighted entity graph -> (ne_type, canonical,
    authority, hub).  In a subject->object KG, authorities are
    entities much said ABOUT (frequent objects of strong evidence)
    and hubs are entities that say much (frequent subjects) — the
    complementary salience axes to PageRank's single score.

    Determinism contract (the weighted_pagerank quantization family):
    hubs start at 1; each half-step computes
    ``raw = round(sum(in/out-neighbour score * weight), quantize)``
    then normalizes by the MAXIMUM raw value —
    ``round(raw / max_raw, quantize)`` — instead of the classical
    L2 norm: max is order-independent (unlike a float sum of
    squares), one IEEE division per node, and scores land in [0, 1]
    with the top hub/authority pinned at exactly 1.0, so the
    fixpoint replays bitwise on any engine and any partitioning.

    Scale shape per iteration: two |V|x|E| equi-joins (score table
    joined to the edge list on src resp. dst — the edge list is
    persisted once), each followed by a partial-agg shuffle, plus a
    scalar max.  Scores are persisted per half-step and the previous
    iteration unpersisted (one-deep lineage, the iterative-plan
    discipline of weighted_pagerank).
    """
    e = edges.select(
        "src", "dst",
        F.col("n_evidence").cast("double").alias("w")).persist()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    hub0 = nodes.select("node", F.lit(1.0).alias("s")).persist()
    hub, auth = hub0, None
    spent = []
    for _ in range(iterations):
        # per half-step, ONE action — the max collect — which also
        # materializes the persisted RAW aggregate; the normalized
        # score table is then a plain projection over that cache, so
        # the next join reads memory and the plan tree stays one
        # level deep.  (Persisting the projection instead and
        # collecting the max separately runs every join twice; a
        # broadcast-1-row-aggregate crossJoin nests the full prior
        # plan and OOMs AQE's plan rendering at ~5 iterations.)
        a_raw = (e.join(hub, e.src == hub.node)
                 .groupBy("dst")
                 .agg(F.round(F.sum(F.col("s") * F.col("w")),
                              quantize).alias("raw"))
                 .persist())
        amax = a_raw.agg(F.max("raw")).collect()[0][0]
        amax = 1.0 if amax is None else amax  # oracle's coalesce
        auth = a_raw.select(
            F.col("dst").alias("node"),
            F.round(F.col("raw") / F.lit(amax), quantize).alias("s"))
        h_raw = (e.join(auth, e.dst == auth.node)
                 .groupBy("src")
                 .agg(F.round(F.sum(F.col("s") * F.col("w")),
                              quantize).alias("raw"))
                 .persist())
        hmax = h_raw.agg(F.max("raw")).collect()[0][0]
        hmax = 1.0 if hmax is None else hmax
        while spent:  # current raws materialized; last round's free
            spent.pop().unpersist()
        spent += [a_raw, h_raw]
        hub = h_raw.select(
            F.col("src").alias("node"),
            F.round(F.col("raw") / F.lit(hmax), quantize).alias("s"))
    out = (
        nodes
        .join(auth.withColumnRenamed("s", "authority"), "node",
              "left")
        .join(hub.withColumnRenamed("s", "hub"), "node", "left")
        .select("node",
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
                F.coalesce("hub", F.lit(0.0)).alias("hub"))
    )
    out = split_node(out).select(
        "ne_type", "canonical", "authority", "hub")
    out = out.localCheckpoint(eager=True)
    for df in (e, nodes, hub0, *spent):
        df.unpersist()
    return out
