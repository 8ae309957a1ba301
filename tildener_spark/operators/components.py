"""Connected components over the mention-similarity graph.

Canonicalization stage (north_rule): no Spark builtin exists, so this
is the classic iterated label-propagation over DataFrame self-joins
(the small-star/large-star family — Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14 — reduced to min-label
propagation, which converges in O(diameter) rounds; our graphs are
star-shaped around canonical hubs, diameter <= 4).

Scale notes (SURVEY.md §4.3.2/3):
  * labels are propagated with a hash join on node id; head entities
    (hub nodes with huge degree) are the skew risk — AQE skew-join is
    on, and ``salt`` optionally splits the min-aggregation into a
    two-level (salted partial, then final) aggregate, the documented
    mitigation for 10^12-doc scale;
  * ``localCheckpoint()`` per iteration truncates lineage so the plan
    does not grow exponentially across iterations;
  * convergence = zero label changes (a count per iteration — cheap,
    and doubles as the per-iteration progress counter for lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tildener_spark.config import EngineConfig


def connected_components(edges: DataFrame, cfg: EngineConfig | None = None,
                         src: str = "src", dst: str = "dst") -> DataFrame:
    """edges(src,dst) -> (node, component) with component = min node id.

    Deterministic: component representative is the lexicographically
    smallest node id in the component.
    """
    cfg = cfg or EngineConfig()
    # duplicate edges are harmless under min-aggregation; skipping the
    # distinct() saves a full shuffle of the edge table
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        # materialize FIRST: labels and every iteration derive from
        # the cached edge set, never from the (possibly expensive)
        # upstream lineage; persist + the isEmpty action below does
        # the materialization without localCheckpoint's extra write
        .persist()
    )
    if sym.isEmpty():
        # fast path: no edges (e.g. a hub graph with no alias chains)
        # — skip the iteration machinery entirely
        return sym.select(
            F.col("a").alias("node"), F.col("b").alias("component"))
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _i in range(cfg.cc_max_iterations):
        # candidate label for b = label(a) over every edge (a,b)
        cand = (
            sym.join(labels.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"), "component")
        )
        # two-level min: salted partial agg defuses hub-node skew
        salted = (
            cand.withColumn(
                "_salt", F.pmod(F.hash("component"), F.lit(cfg.salt_buckets)))
            .groupBy("node", "_salt")
            .agg(F.min("component").alias("component"))
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels = (
            labels.withColumnRenamed("component", "old")
            .join(salted.withColumnRenamed("component", "prop"),
                  "node", "left")
            .select(
                "node",
                F.least(
                    F.col("old"), F.coalesce("prop", F.col("old"))
                ).alias("component"),
                (F.col("old") != F.least(
                    F.col("old"), F.coalesce("prop", F.col("old")))
                 ).cast("long").alias("changed"),
            )
            .localCheckpoint()
        )
        n_changed = new_labels.agg(F.sum("changed")).collect()[0][0] or 0
        labels = new_labels.select("node", "component")
        if n_changed == 0:
            break
    return labels
