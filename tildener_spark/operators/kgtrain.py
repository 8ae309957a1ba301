"""Training-set preparation over the canonical knowledge graph:
type-consistent negative sampling (the corrupt-triple pairs a
TransE/DistMult-style KG-embedding trainer consumes) and seeded
random walks (the node-sequence corpus a DeepWalk/node2vec-style
trainer consumes).

Neither has a reference analog (TildeNER stops at tagged files);
both are the standard downstream consumers of a constructed KG, and
both follow the engine's oracle contract: every "random" choice is
an md5 of a deterministic key, so a DuckDB replay reproduces the
sample bitwise and the driver's correctness gate covers what is
normally untestable sampling code.

Scale design (10^12-doc graph):

* negative sampling touches each positive triple exactly twice (one
  corruption per slot); the per-type entity vocabulary it indexes
  into is |V|-sized and broadcast — no shuffle keyed on the triple
  stream beyond the final existence anti-join (which is the point:
  filtered negative sampling IS an anti-join);
* random walks are |walks| x T joins against a top-``max_deg``
  capped, rank-indexed adjacency — the cap is the hub guard (a
  head entity with 10^6 out-edges would otherwise make every step a
  skew join) and the standard degree-truncation used by large-scale
  walk engines; each step is an equi-join on (node, rank), so AQE
  and broadcast apply when the frontier is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tildener_spark.operators.graphstats import SEP

__all__ = ["negative_sampling", "random_walks"]

US = "\x1f"  # md5-key field separator (never inside surfaces)


def _h32(*cols):
    """First 32 md5 bits of the US-joined key as a bigint — the
    deterministic stand-in for a uniform draw, replayed in DuckDB as
    ('0x' || substring(md5(key), 1, 8))::bigint."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(US, *cols)), 1, 8), 16, 10
    ).cast("long")


def negative_sampling(canon_triples: DataFrame,
                      seed: str = "neg42") -> DataFrame:
    """One corrupted triple per (positive, slot) pair, type-consistent
    and filtered (Bordes et al. 2013 semantics, deterministic).

    For each distinct positive (s_type, s, pred, o_type, o) and each
    slot in {subj, obj}: rank the entity vocabulary of the slot's
    type by name, draw index = md5(seed, triple, slot) mod n_type,
    step to the next index when the draw lands on the original
    entity (the classic resample-once rule, exact here because the
    vocabulary is ranked), and drop the corruption when the type has
    a single entity (nothing to corrupt with).  Corruptions that
    collide with an existing positive are anti-joined away —
    "filtered" sampling, so the trainer never sees a false negative.

    Returns (slot, subj_type, subj, pred, obj_type, obj) —
    corrupted field already substituted.
    """
    pos = canon_triples.select(
        F.col("subj_type").alias("s_type"),
        F.col("subj_canonical").alias("s"),
        "pred",
        F.col("obj_type").alias("o_type"),
        F.col("obj_canonical").alias("o"),
    ).distinct()

    ents = (
        canon_triples.select(F.col("subj_type").alias("ne_type"),
                             F.col("subj_canonical").alias("ent"))
        .unionByName(
            canon_triples.select(F.col("obj_type").alias("ne_type"),
                                 F.col("obj_canonical").alias("ent")))
        .distinct()
        .withColumn("idx", F.row_number().over(
            Window.partitionBy("ne_type").orderBy(F.asc("ent"))) - 1)
    )
    sizes = ents.groupBy("ne_type").agg(
        F.count(F.lit(1)).alias("n_type"))

    def corrupt(slot: str) -> DataFrame:
        typ, orig = (("s_type", "s") if slot == "subj"
                     else ("o_type", "o"))
        draw = (
            pos
            .join(F.broadcast(sizes),
                  F.col(typ) == F.col("ne_type"))
            .filter(F.col("n_type") > 1)
            .withColumn("draw", F.pmod(
                _h32(F.lit(seed), "s_type", "s", "pred",
                     "o_type", "o", F.lit(slot)),
                F.col("n_type")))
        )
        # original's index, to apply the step-on-collision rule
        with_orig = draw.join(
            F.broadcast(ents.select(
                F.col("ne_type").alias("_t"),
                F.col("ent").alias("_e"),
                F.col("idx").alias("orig_idx"))),
            (F.col(typ) == F.col("_t"))
            & (F.col(orig) == F.col("_e")))
        picked = with_orig.withColumn(
            "pick_idx",
            F.when(F.col("draw") == F.col("orig_idx"),
                   F.pmod(F.col("draw") + 1, F.col("n_type")))
            .otherwise(F.col("draw")))
        repl = picked.join(
            F.broadcast(ents.select(
                F.col("ne_type").alias("_rt"),
                F.col("idx").alias("_ri"),
                F.col("ent").alias("repl"))),
            (F.col(typ) == F.col("_rt"))
            & (F.col("pick_idx") == F.col("_ri")))
        if slot == "subj":
            out = repl.select(
                F.lit("subj").alias("slot"),
                F.col("s_type").alias("subj_type"),
                F.col("repl").alias("subj"),
                "pred",
                F.col("o_type").alias("obj_type"),
                F.col("o").alias("obj"))
        else:
            out = repl.select(
                F.lit("obj").alias("slot"),
                F.col("s_type").alias("subj_type"),
                F.col("s").alias("subj"),
                "pred",
                F.col("o_type").alias("obj_type"),
                F.col("repl").alias("obj"))
        return out

    negs = corrupt("subj").unionByName(corrupt("obj"))
    exists = pos.select(
        F.col("s_type").alias("subj_type"), F.col("s").alias("subj"),
        "pred",
        F.col("o_type").alias("obj_type"), F.col("o").alias("obj"))
    return negs.join(
        exists, ["subj_type", "subj", "pred", "obj_type", "obj"],
        "left_anti",
    ).select("slot", "subj_type", "subj", "pred", "obj_type", "obj")


def random_walks(canon_triples: DataFrame, n_seeds: int = 8,
                 walks_per_seed: int = 4, n_steps: int = 5,
                 max_deg: int = 64,
                 seed: str = "walk42") -> DataFrame:
    """Deterministic uniform random walks from the evidence-mass hub
    seeds — the sentence corpus for a skip-gram-over-graph trainer.

    Adjacency is the rank-indexed top-``max_deg`` out-edge table per
    node ((evidence desc, dst asc) total order — the hub guard);
    each step draws md5(seed, walk, step, node) mod outdeg and
    equi-joins on (node, rank).  Dead-end nodes absorb the walk
    (standard truncation).  Walk count and length are parameters,
    the draw is pinned, so the full path set replays in DuckDB as
    ``n_steps`` unrolled joins.

    Returns (walk_id, path, n_steps) with path = '>' -joined node
    keys (``ne_type SEP canonical``).
    """
    e = (canon_triples
         .groupBy("subj_type", "subj_canonical",
                  "obj_type", "obj_canonical")
         .agg(F.count(F.lit(1)).alias("w"))
         .select(
             F.concat_ws(SEP, "subj_type", "subj_canonical")
             .alias("src"),
             F.concat_ws(SEP, "obj_type", "obj_canonical")
             .alias("dst"),
             "w"))
    adj = (e.withColumn("rk", F.row_number().over(
        Window.partitionBy("src").orderBy(
            F.desc("w"), F.asc("dst"))) - 1)
        .filter(F.col("rk") < max_deg)
        .select("src", "rk", "dst"))
    deg = adj.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg"))

    mass = (e.select(F.col("src").alias("node"), "w")
            .unionByName(e.select(F.col("dst").alias("node"), "w"))
            .groupBy("node").agg(F.sum("w").alias("mass")))
    seeds = (mass
             .withColumn("srk", F.row_number().over(
                 Window.orderBy(F.desc("mass"), F.asc("node"))))
             .filter(F.col("srk") <= n_seeds)
             .select("node"))

    walks = seeds.select(
        F.explode(F.array(*[F.lit(i) for i in range(walks_per_seed)]))
        .alias("wi"), "node",
    ).select(
        F.concat_ws("#", "node", "wi").alias("walk_id"),
        F.col("node").alias("cur"),
        F.col("node").alias("path"),
    )

    for step in range(1, n_steps + 1):
        # fresh aliased projections per step: the same adj/deg frames
        # join once per unrolled step, and Spark's self-join
        # disambiguation needs distinct attribute ids each time
        a = adj.select(F.col("src").alias("_as"),
                       F.col("rk").alias("_ark"),
                       F.col("dst").alias("_adst"))
        d = deg.select(F.col("src").alias("_ds"),
                       F.col("outdeg").alias("_deg"))
        chosen = (
            walks
            .join(d, F.col("cur") == F.col("_ds"), "left")
            .withColumn("choice", F.when(
                F.col("_deg").isNotNull(),
                F.pmod(_h32(F.lit(seed), "walk_id",
                            F.lit(str(step)), "cur"),
                       F.col("_deg"))))
            .drop("_ds", "_deg")
        )
        walks = (
            chosen.join(
                a,
                (F.col("cur") == F.col("_as"))
                & (F.col("choice") == F.col("_ark")),
                "left")
            .select(
                "walk_id",
                F.coalesce("_adst", "cur").alias("cur"),
                F.when(F.col("_adst").isNotNull(),
                       F.concat_ws(">", "path", "_adst"))
                .otherwise(F.col("path")).alias("path"))
        )

    return walks.select(
        "walk_id", "path",
        (F.size(F.split("path", ">")) - 1).cast("long")
        .alias("n_steps"))
