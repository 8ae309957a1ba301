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

__all__ = ["negative_sampling", "random_walks", "train_transe",
           "train_transe_minibatch"]

US = "\x1f"  # md5-key field separator (never inside surfaces)


def _h32(*cols):
    """First 32 md5 bits of the US-joined key as a bigint — the
    deterministic stand-in for a uniform draw, replayed in DuckDB as
    ('0x' || substring(md5(key), 1, 8))::bigint."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(US, *cols)), 1, 8), 16, 10
    ).cast("long")


def negative_sampling(canon_triples: DataFrame,
                      seed: str = "neg42",
                      keep_original: bool = False) -> DataFrame:
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
    corrupted field already substituted.  ``keep_original=True``
    additionally returns ``orig_subj``/``orig_obj`` (the positive's
    own entities), pairing each corruption with its positive — the
    (pos, neg) pair shape a margin-loss trainer consumes
    (:func:`train_transe`).
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
                F.col("o").alias("obj"),
                F.col("s").alias("orig_subj"),
                F.col("o").alias("orig_obj"))
        else:
            out = repl.select(
                F.lit("obj").alias("slot"),
                F.col("s_type").alias("subj_type"),
                F.col("s").alias("subj"),
                "pred",
                F.col("o_type").alias("obj_type"),
                F.col("repl").alias("obj"),
                F.col("s").alias("orig_subj"),
                F.col("o").alias("orig_obj"))
        return out

    negs = corrupt("subj").unionByName(corrupt("obj"))
    exists = pos.select(
        F.col("s_type").alias("subj_type"), F.col("s").alias("subj"),
        "pred",
        F.col("o_type").alias("obj_type"), F.col("o").alias("obj"))
    out = negs.join(
        exists, ["subj_type", "subj", "pred", "obj_type", "obj"],
        "left_anti")
    cols = ["slot", "subj_type", "subj", "pred", "obj_type", "obj"]
    if keep_original:
        cols += ["orig_subj", "orig_obj"]
    return out.select(*cols)


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


def _node(typ_col: str, ent_col: str):
    return F.concat_ws(SEP, typ_col, ent_col)


def _init_val(kind: str, name_col, d_col, seed: str):
    """Deterministic integer init in [-100, 100]: md5 of
    (seed, kind, name, dim) mod 201 - 100 — replayed verbatim by the
    oracle."""
    return (F.pmod(_h32(F.lit(seed), F.lit(kind), name_col,
                        d_col.cast("string")),
                   F.lit(201)) - 100).cast("long")


def _sign(c):
    return (F.when(c > 0, 1).when(c < 0, -1).otherwise(0)
            .cast("long"))


def _pair_table(canon_triples: DataFrame, seed: str) -> DataFrame:
    """(positive, corruption) pairs keyed for one-hinge-per-pair:
    pk carries the corrupted triple AND the original entities (two
    positives can draw the same corruption)."""
    negs = negative_sampling(canon_triples, seed=seed,
                             keep_original=True)
    return negs.select(
        F.concat_ws(US, "slot", "subj_type", "subj", "pred",
                    "obj_type", "obj", "orig_subj", "orig_obj")
        .alias("pk"),
        _node("subj_type", "orig_subj").alias("ps"),
        F.col("pred").alias("pp"),
        _node("obj_type", "orig_obj").alias("po"),
        _node("subj_type", "subj").alias("ns"),
        _node("obj_type", "obj").alias("no"),
    )


def _score_join(pairs: DataFrame, emb_e: DataFrame,
                emb_r: DataFrame) -> DataFrame:
    """Five (name, dim)-keyed equi-joins of the pair table against
    the parameter tables + the per-dim L1 terms."""
    j = pairs.join(
        emb_e.select(F.col("name").alias("_n0"), "d",
                     F.col("v").alias("v_ps")),
        F.col("ps") == F.col("_n0")).drop("_n0")
    for role, table in (("po", emb_e), ("ns", emb_e),
                        ("no", emb_e), ("pp", emb_r)):
        t = table.select(F.col("name").alias(f"_n_{role}"),
                         F.col("d").alias(f"_d_{role}"),
                         F.col("v").alias(f"v_{role}"))
        j = j.join(
            t, (F.col(role) == F.col(f"_n_{role}"))
            & (F.col("d") == F.col(f"_d_{role}"))
        ).drop(f"_n_{role}", f"_d_{role}")
    return (j.withColumn("dpos", F.col("v_ps") + F.col("v_pp")
                         - F.col("v_po"))
             .withColumn("dneg", F.col("v_ns") + F.col("v_pp")
                         - F.col("v_no")))


def _pair_scores(j: DataFrame) -> DataFrame:
    return j.groupBy("pk").agg(
        F.sum(F.abs("dpos")).alias("spos"),
        F.sum(F.abs("dneg")).alias("sneg"))


def _hinge_loss(scores: DataFrame, margin: int) -> int:
    loss = scores.agg(F.sum(
        F.greatest(F.lit(0),
                   F.lit(margin) + F.col("spos")
                   - F.col("sneg"))).cast("long")
        .alias("l")).collect()[0]["l"]
    return int(loss or 0)


def _grad_update(j: DataFrame, scores: DataFrame, margin: int,
                 lr: int) -> DataFrame:
    """Sign gradients over the active (margin-violating) pairs,
    summed per (kind, name, d) and clamped to ±lr."""
    active = scores.filter(
        F.lit(margin) + F.col("spos") - F.col("sneg") > 0
    ).select("pk")
    contrib = (
        j.join(active, "pk")
        .select("d", F.explode(F.array(
            F.struct(F.lit("E").alias("kind"),
                     F.col("ps").alias("name"),
                     _sign(F.col("dpos")).alias("g")),
            F.struct(F.lit("R").alias("kind"),
                     F.col("pp").alias("name"),
                     (_sign(F.col("dpos"))
                      - _sign(F.col("dneg"))).alias("g")),
            F.struct(F.lit("E").alias("kind"),
                     F.col("po").alias("name"),
                     (-_sign(F.col("dpos"))).alias("g")),
            F.struct(F.lit("E").alias("kind"),
                     F.col("ns").alias("name"),
                     (-_sign(F.col("dneg"))).alias("g")),
            F.struct(F.lit("E").alias("kind"),
                     F.col("no").alias("name"),
                     _sign(F.col("dneg")).alias("g")),
        )).alias("c"))
        .select("d", "c.kind", "c.name", "c.g")
    )
    grads = contrib.groupBy("kind", "name", "d").agg(
        F.sum("g").alias("gsum"))
    return grads.select(
        "kind", "name", "d",
        F.greatest(F.lit(-lr),
                   F.least(F.lit(lr), F.col("gsum")))
        .cast("long").alias("u"))


def _apply_update(emb: DataFrame, upd: DataFrame,
                  kind: str) -> DataFrame:
    return (emb.join(upd.filter(F.col("kind") == kind)
                     .drop("kind"), ["name", "d"], "left")
            .select("name", "d",
                    (F.col("v") - F.coalesce("u", F.lit(0)))
                    .cast("long").alias("v")))


def train_transe(spark, canon_triples: DataFrame, dim: int = 8,
                 epochs: int = 3, margin: int = 4, lr: int = 3,
                 seed: str = "emb42") -> dict:
    """Deterministic ALL-INTEGER TransE training (Bordes et al. 2013
    L1 form) over the canonical KG — the embedding half of the
    training-prep stack, composing :func:`negative_sampling` for its
    (positive, corruption) pairs.

    Every float source of nondeterminism is removed: integer md5
    init, L1 scores (integer sums), sign gradients, and a clamped
    integer update ``v -= clamp(sum of signed contributions, ±lr)``
    per (parameter, dim) — synchronous full-batch epochs, so the
    whole run replays bitwise on any engine/partitioning and the
    driver's oracle gate can value-hash a TRAINING run end to end
    (normally untestable territory).

    Scale shape per epoch: five (name, dim)-keyed equi-joins of the
    pair table against the |V|x dim / |preds|x dim parameter tables,
    one pair-keyed score agg, one parameter-keyed gradient agg, one
    update join — all partial-agg shuffles; the one driver-side value
    is the scalar epoch loss (an integer sum, collected like
    pagerank's dangling mass).

    Returns {"embeddings": DataFrame(kind, name, d, v),
    "loss_by_epoch": [int, ...]} — loss_by_epoch[0] is the
    pre-training loss.
    """
    from tildener_spark.materialize import materialize_once, release

    pairs = _pair_table(canon_triples, "neg42").persist()
    pairs.count()

    nodes = (canon_triples.select(
        _node("subj_type", "subj_canonical").alias("name"))
        .unionByName(canon_triples.select(
            _node("obj_type", "obj_canonical").alias("name")))
        .distinct())
    preds = canon_triples.select(
        F.col("pred").alias("name")).distinct()
    dims = spark.range(dim).select(F.col("id").cast("int").alias("d"))

    emb_e = materialize_once(nodes.crossJoin(dims).select(
        "name", "d", _init_val("E", F.col("name"), F.col("d"), seed)
        .alias("v")))
    emb_r = materialize_once(preds.crossJoin(dims).select(
        "name", "d", _init_val("R", F.col("name"), F.col("d"), seed)
        .alias("v")))

    losses = []
    for _ep in range(epochs + 1):
        j = _score_join(pairs, emb_e, emb_r)
        scores = _pair_scores(j)
        losses.append(_hinge_loss(scores, margin))
        if _ep == epochs:
            break
        upd = _grad_update(j, scores, margin, lr)
        new_e = materialize_once(_apply_update(emb_e, upd, "E"))
        new_r = materialize_once(_apply_update(emb_r, upd, "R"))
        release(emb_e)
        release(emb_r)
        emb_e, emb_r = new_e, new_r

    out = (emb_e.select(F.lit("E").alias("kind"), "name",
                        F.col("d").cast("long").alias("d"), "v")
           .unionByName(
               emb_r.select(F.lit("R").alias("kind"), "name",
                            F.col("d").cast("long").alias("d"),
                            "v")))
    pairs.unpersist()
    return {"embeddings": out, "loss_by_epoch": losses}


def train_transe_minibatch(spark, canon_triples: DataFrame,
                           dim: int = 8, epochs: int = 2,
                           batches: int = 3, margin: int = 4,
                           lr: int = 3,
                           seed: str = "emb42") -> dict:
    """Mini-batch TransE: the shape a 10^9-triple graph actually
    trains at (r4 verdict item 4), with the SAME all-integer
    determinism contract as :func:`train_transe`.

    Two things change vs the full-batch form, both md5-derived so the
    whole trajectory still replays bitwise in an unrolled oracle:

    * **negative re-sampling per epoch** — epoch ``k`` draws its
      corruptions with seed ``neg42|ep{k}``, so the trainer sees
      fresh negatives every pass (Bordes et al. resample per epoch;
      full-batch reuses one draw forever);
    * **md5-bucketed mini-batches** — each (positive, corruption)
      pair lands in bucket ``md5(seed, 'batch', pk) mod batches``
      and parameters update after EVERY bucket, so within one epoch
      later batches see the earlier batches' updates (true SGD
      staleness semantics, not one giant synchronous step).

    Scale shape: per update step the five keyed joins touch only
    ``|pairs|/batches`` rows; parameter tables stay |V| x dim.  At
    10^9 triples ``batches`` grows so each bucket fits the cluster's
    shuffle budget — the bucket count is the only knob, nothing else
    about the plan changes.

    Returns {"embeddings": ..., "loss_by_epoch": [int, ...]}:
    entry k < epochs is epoch k's loss over ITS OWN pair draw before
    its updates; the last entry is the final loss over the last
    epoch's pairs after all updates.
    """
    from tildener_spark.materialize import (
        materialize_once, materialize_step)

    nodes = (canon_triples.select(
        _node("subj_type", "subj_canonical").alias("name"))
        .unionByName(canon_triples.select(
            _node("obj_type", "obj_canonical").alias("name")))
        .distinct())
    preds = canon_triples.select(
        F.col("pred").alias("name")).distinct()
    dims = spark.range(dim).select(F.col("id").cast("int").alias("d"))

    emb_e = materialize_once(nodes.crossJoin(dims).select(
        "name", "d", _init_val("E", F.col("name"), F.col("d"), seed)
        .alias("v")))
    emb_r = materialize_once(preds.crossJoin(dims).select(
        "name", "d", _init_val("R", F.col("name"), F.col("d"), seed)
        .alias("v")))

    losses = []
    pairs = None
    for ep in range(epochs):
        if pairs is not None:
            pairs.unpersist()
        pairs = _pair_table(canon_triples, f"neg42|ep{ep}") \
            .withColumn("b", F.pmod(
                _h32(F.lit(seed), F.lit("batch"), F.col("pk")),
                F.lit(batches))).persist()
        pairs.count()
        losses.append(_hinge_loss(
            _pair_scores(_score_join(pairs, emb_e, emb_r)), margin))
        for b in range(batches):
            sub = pairs.filter(F.col("b") == b).drop("b")
            j = _score_join(sub, emb_e, emb_r)
            upd = _grad_update(j, _pair_scores(j), margin, lr)
            # HARD parquet barrier per step (materialize_step doc):
            # in-memory materialization compounds either Catalyst
            # size statistics (localCheckpoint) or cache-rebuild
            # lineage (persist/unpersist) across the step chain —
            # both measured unbounded by ~8 chained steps
            emb_e = materialize_step(
                _apply_update(emb_e, upd, "E"), "emb_e")
            emb_r = materialize_step(
                _apply_update(emb_r, upd, "R"), "emb_r")
    losses.append(_hinge_loss(
        _pair_scores(_score_join(pairs, emb_e, emb_r)), margin)
        if pairs is not None else 0)

    out = (emb_e.select(F.lit("E").alias("kind"), "name",
                        F.col("d").cast("long").alias("d"), "v")
           .unionByName(
               emb_r.select(F.lit("R").alias("kind"), "name",
                            F.col("d").cast("long").alias("d"),
                            "v")))
    if pairs is not None:
        pairs.unpersist()
    return {"embeddings": out, "loss_by_epoch": losses}
