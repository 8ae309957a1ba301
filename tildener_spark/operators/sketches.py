"""Mergeable sketches — from-scratch HyperLogLog (Flajolet et al.
2007) and Count-Min (Cormode & Muthukrishnan 2005), every step
engine-portable.

Why this exists: at 10^12 documents, "how many distinct tokens /
urls / shingles per corpus slice" is a routine report, and an exact
``count(distinct)`` is a full shuffle of the distinct key space.
The HLL register table is 256 rows per group, mergeable by ``max``
— the classic partial-agg-friendly sketch.  Spark's built-in
``approx_count_distinct`` exists but its HLL++ register hashing is
JVM-private and cannot be replayed by another engine; this
implementation derives every bit from ``md5`` so the DuckDB oracle
hashes the IDENTICAL estimate (the engine's oracle contract).

Determinism ledger (the usual cross-engine traps, each pinned):

* register index / remainder — integer parses of md5 hex;
* rho (leading-zero rank) — a generated 56-branch integer CASE,
  no log2 anywhere;
* the register sum — INTEGER: sum of 2^(55-M_j) as bigint (bounded
  by 255*2^55 + 2^54 < 2^63 once >= 1 register is occupied), so the
  sum is order/partitioning-independent;
* alpha*m^2*2^55 — ONE Python-computed double literal shared by
  both engines; the estimate is a single IEEE division of it by the
  integer sum;
* the small-range linear-counting branch — a generated 255-branch
  CASE of Python-precomputed ``round(m*ln(m/V), 6)`` literals, so
  neither engine evaluates ``ln`` at query time.

Scale shape: two partial-agg shuffles — (group, reg) max, then a
256-rows-per-group fold.  The exact ``count(distinct)`` column is
the small-scale VALIDATOR only (it is the thing the sketch exists
to avoid); production callers use ``hll_estimate`` alone.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from tildener_spark.operators.dedup import WS_RE

M_REG = 256          # registers (b = 8 index bits)
W_BITS = 56          # remainder bits read from the md5 (14 hex)
_SHIFT = W_BITS - 1  # register term = 2^(_SHIFT - M_j), M_j >= 1

# alpha_256 * m^2 * 2^55 as one double literal (repr round-trips
# exactly, so Spark and DuckDB parse the same IEEE value)
_ALPHA = 0.7213 / (1.0 + 1.079 / M_REG)
C_NUM = repr(_ALPHA * M_REG * M_REG * float(1 << _SHIFT))
# linear-counting threshold (classic 2.5 * m)
LC_THRESHOLD = 2.5 * M_REG


def rho_case_sql(col: str = "w") -> str:
    """rho = leading-zero count of the 56-bit remainder + 1, as a
    pure integer-comparison CASE (binary-search-free but constant-
    folded by both engines; no floating log anywhere)."""
    whens = " ".join(
        f"when {col} >= {1 << (W_BITS - r)} then {r}"
        for r in range(1, W_BITS + 1))
    return f"(case {whens} else {W_BITS + 1} end)"


def term_case_sql(col: str = "m") -> str:
    """2^(55 - M_j) as bigint for M_j in 1..55, else 0 (M_j > 55
    contributes < 1 to the scaled sum; both engines agree because
    the formula IS this CASE)."""
    whens = " ".join(
        f"when {m} then {1 << (_SHIFT - m)}"
        for m in range(1, _SHIFT + 1))
    return f"(case {col} {whens} else 0 end)"


def lincount_case_sql(col: str = "n_zero") -> str:
    """Linear-counting estimate m*ln(m/V) for V in 1..m-1, every
    value precomputed in Python and embedded as a round(.,6) double
    literal — query-time ln never runs."""
    whens = " ".join(
        f"when {v} then {round(M_REG * math.log(M_REG / v), 6)!r}"
        for v in range(1, M_REG))
    return f"(case {col} {whens} else 0e0 end)"


def hll_cardinality(docs: DataFrame, group_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """Per-group distinct-token cardinality: HLL estimate + exact
    validator + relative error.

    Returns (group, n_exact, hll_est, err_pct) with ``hll_est``
    bitwise-reproducible on any engine/partitioning (see module
    docstring).  ``n_exact``/``err_pct`` are the validation columns;
    a production 100 TB run selects the sketch path only.
    """
    toks = (
        docs
        .select(F.col(group_col).alias("grp"),
                F.explode(F.split(F.lower(text_col), WS_RE))
                .alias("tok"))
        .filter(F.col("tok") != "")
    )
    regs = (
        toks
        .select("grp", F.md5("tok").alias("h"))
        .select(
            "grp",
            F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
            .alias("reg"),
            F.conv(F.substring("h", 3, 14), 16, 10).cast("long")
            .alias("w"))
        .withColumn("rho", F.expr(rho_case_sql("w")).cast("int"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("m"))
    )
    agg = (
        regs
        .groupBy("grp")
        .agg(F.sum(F.expr(term_case_sql("m"))).cast("long")
             .alias("s_used"),
             F.count(F.lit(1)).cast("long").alias("used"))
        .select(
            "grp",
            (F.lit(M_REG) - F.col("used")).cast("int").alias("n_zero"),
            (F.expr(C_NUM)
             / (F.col("s_used")
                + (F.lit(M_REG) - F.col("used"))
                * F.lit(1 << _SHIFT))).alias("raw"))
        .select(
            "grp",
            F.when((F.col("raw") <= F.lit(LC_THRESHOLD))
                   & (F.col("n_zero") > 0),
                   F.expr(lincount_case_sql("n_zero")))
            .otherwise(F.round("raw", 6)).alias("hll_est"))
    )
    exact = toks.groupBy("grp").agg(
        F.countDistinct("tok").cast("long").alias("n_exact"))
    return (
        exact.join(agg, "grp")
        .select(
            F.col("grp").alias(group_col), "n_exact", "hll_est",
            F.round(F.abs(F.col("hll_est") - F.col("n_exact"))
                    / F.col("n_exact") * 100, 4).alias("err_pct"))
    )


# --- Count-Min sketch ------------------------------------------------

CMS_D = 4       # independent hash rows
CMS_W = 512     # buckets per row

# Each row's hash is an independent md5 stream: 8 hex chars (32 bits)
# of md5('r<j>\x1f' || token), mod CMS_W.  Pure integer arithmetic on
# both engines, so the sketch — and every point estimate read from
# it — replays bitwise in the oracle.


def cms_bucket_spark(tok_col, row: int):
    """Spark expression for hash row ``row``'s bucket of a token."""
    h = F.md5(F.concat(F.lit(f"r{row}\x1f"), tok_col))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
        F.lit(CMS_W))


def cms_bucket_sql(tok_expr: str, row: int) -> str:
    """DuckDB mirror of :func:`cms_bucket_spark` (same md5 prefix,
    same 32-bit slice, same modulus)."""
    return (f"(cast(concat('0x', substr(md5(concat('r{row}'"
            f" || chr(31), {tok_expr})), 1, 8)) as bigint)"
            f" % {CMS_W})")


def cms_heavy_hitters(docs: DataFrame, text_col: str = "text",
                      threshold: int = 50) -> DataFrame:
    """Corpus-wide heavy-hitter tokens via a from-scratch Count-Min
    sketch: build the d x w counter matrix in one partial-agg pass,
    then answer point queries for every distinct token by broadcast-
    joining the (tiny, fixed-size) sketch and taking the row-wise
    minimum.

    Returns (token, n_exact, cms_est, overcount) for tokens whose
    ESTIMATE clears ``threshold`` — the CMS one-sided guarantee
    (cms_est >= n_exact always) means no true heavy hitter is ever
    missed, only light tokens colliding upward can sneak in;
    ``overcount = cms_est - n_exact`` (>= 0) is the validator column.

    Scale shape: the sketch is ONE partial-aggregating shuffle whose
    key space is fixed at d*w = 4*512 = 2048 rows regardless of
    corpus size — the mergeability that makes CMS the standard
    streaming frequency summary; point-query reads broadcast those
    2048 rows, so the lookup join never shuffles the token table.
    The exact count is the small-scale validator only (it is the
    full-shuffle aggregate the sketch exists to avoid).
    """
    toks = (
        docs
        .select(F.explode(F.split(F.lower(text_col), WS_RE))
                .alias("tok"))
        .filter(F.col("tok") != "")
    )
    hits = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 cms_bucket_spark(F.col("tok"), j).alias("b"))
        for j in range(CMS_D)])).alias("rb")
    sketch = (
        toks.select(hits)
        .select("rb.j", "rb.b")
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    exact = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"))
    probes = exact.select(
        "tok", "n_exact",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     cms_bucket_spark(F.col("tok"), j).alias("b"))
            for j in range(CMS_D)])).alias("rb"),
    ).select("tok", "n_exact", "rb.j", "rb.b")
    return (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("tok", "n_exact")
        .agg(F.min("c").alias("cms_est"))
        .filter(F.col("cms_est") >= threshold)
        .select(F.col("tok").alias("token"), "n_exact", "cms_est",
                (F.col("cms_est") - F.col("n_exact")).cast("long")
                .alias("overcount"))
    )


# --- KMV / theta bottom-k distinct sketch ----------------------------

KMV_K = 64           # sketch size (bottom-k distinct hashes)
KMV_SALTS = 16       # stage-1 sort salt cells per group
_H_BITS = 60         # md5 hex chars 1..15 -> 60-bit integer hash
_H_SPACE = float(1 << _H_BITS)   # 2^60, exactly double-representable


def _kmv_hash(tok_col):
    """60-bit integer hash: first 15 hex chars of md5 — identical
    integer on any engine (DuckDB: ``from_hex``-free conv replay)."""
    return F.conv(F.substring(F.md5(tok_col), 1, 15), 16, 10) \
        .cast("long")


def kmv_hash_sql(tok_expr: str) -> str:
    """The DuckDB spelling of :func:`_kmv_hash`:
    ``('0x' || first-15-hex)::bigint`` == Spark conv(hex, 16, 10)."""
    return f"(('0x' || substring(md5({tok_expr}), 1, 15))::bigint)"


def bottom_k_hashes(toks: DataFrame, k: int = KMV_K,
                    grp_col: str = "grp",
                    hash_col: str = "h") -> DataFrame:
    """Per-group bottom-k DISTINCT hash values, the KMV sketch body
    (Bar-Yossef et al. 2002 / the theta-sketch sample set).

    Scale shape: the big sort is salted — stage 1 ranks within
    (group, h % KMV_SALTS) cells so no single reducer ever sorts a
    whole group's hash stream (head-group skew defused), and emits at
    most ``KMV_SALTS * k`` candidates per group; stage 2 re-ranks
    that bounded candidate set.  ``dense_rank`` (not row_number)
    makes both stages duplicate-tolerant, so no distinct shuffle of
    the full key space ever runs — replacing exactly the aggregate
    the sketch exists to avoid.

    Returns (grp, h, rk) with rk in 1..k over distinct h ascending.
    """
    from pyspark.sql import Window
    cand = (
        toks
        .withColumn("_salt", F.pmod(F.col(hash_col), F.lit(KMV_SALTS)))
        .withColumn("_rk1", F.dense_rank().over(
            Window.partitionBy(grp_col, "_salt")
            .orderBy(F.col(hash_col).asc())))
        .filter(F.col("_rk1") <= k)
        .select(grp_col, hash_col)
        .distinct()
    )
    return (
        cand
        .withColumn("rk", F.dense_rank().over(
            Window.partitionBy(grp_col)
            .orderBy(F.col(hash_col).asc())))
        .filter(F.col("rk") <= k)
    )


def kmv_set_ops(docs: DataFrame, group_col: str = "source",
                text_col: str = "text", k: int = KMV_K) -> DataFrame:
    """Pairwise distinct-set algebra between corpus slices from
    merged KMV sketches: union / intersection cardinality estimates
    and a sketch Jaccard, with exact validators.

    The theta estimator: per pair, theta_h = min of the two k-th
    minima (2^60 when a side has < k distinct — its sketch IS the
    exact set and theta must not clip the partner's sample); any set
    expression over the below-theta samples estimates its true
    cardinality as ``count * 2^60 / theta_h`` (one IEEE division of
    integer inputs, so the oracle replays it bitwise).  Sketches
    merge by array algebra over k-sized lists — the per-pair work is
    O(k log k) on a #groups^2-row broadcast join, nothing rescans the
    corpus.

    Returns (src_a, src_b, union_est, inter_est, jaccard_est,
    union_exact, inter_exact) for src_a < src_b.  The exact columns
    are small-scale validators — the distinct-TOKEN join the sketch
    replaces, computed over the token strings themselves (not their
    60-bit hashes, which a cross-source collision would inflate;
    round-4 advisor finding).
    """
    toks = (
        docs
        .select(F.col(group_col).alias("grp"),
                F.explode(F.split(F.lower(text_col), WS_RE))
                .alias("tok"))
        .filter(F.col("tok") != "")
        .select("grp", "tok", _kmv_hash(F.col("tok")).alias("h"))
    )
    bk = bottom_k_hashes(toks, k)
    sk = (
        bk.groupBy("grp")
        .agg(F.sort_array(F.collect_set("h")).alias("hs"))
        .select(
            "grp", "hs",
            # theta_h: k-th minimum, or full space when under-full
            F.when(F.size("hs") >= k,
                   F.element_at("hs", k))
            .otherwise(F.lit(1 << _H_BITS)).cast("long")
            .alias("theta_h"))
    )
    a = sk.select(F.col("grp").alias("src_a"),
                  F.col("hs").alias("ha"),
                  F.col("theta_h").alias("ta"))
    b = sk.select(F.col("grp").alias("src_b"),
                  F.col("hs").alias("hb"),
                  F.col("theta_h").alias("tb"))
    theta = F.least("ta", "tb")
    below = lambda arr: F.size(F.filter(  # noqa: E731
        arr, lambda x: x < theta))
    est = lambda cnt: F.round(  # noqa: E731
        cnt.cast("double") * F.lit(_H_SPACE)
        / theta.cast("double"), 6)
    pairs = (
        a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
        .select(
            "src_a", "src_b",
            est(below(F.array_union("ha", "hb"))).alias("union_est"),
            est(below(F.array_intersect("ha", "hb")))
            .alias("inter_est"),
            F.round(
                below(F.array_intersect("ha", "hb")).cast("double")
                / F.greatest(below(F.array_union("ha", "hb")),
                             F.lit(1)).cast("double"), 6)
            .alias("jaccard_est"))
    )
    d = toks.select("grp", "tok").distinct()
    da = d.select(F.col("grp").alias("src_a"), "tok")
    db = d.select(F.col("grp").alias("src_b"), "tok")
    inter_exact = (
        da.join(db, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_exact"))
    )
    sizes = d.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    exact = (
        sizes.select(F.col("grp").alias("src_a"),
                     F.col("n").alias("na"))
        .join(sizes.select(F.col("grp").alias("src_b"),
                           F.col("n").alias("nb")),
              F.col("src_a") < F.col("src_b"))
        .join(inter_exact, ["src_a", "src_b"], "left")
        .select(
            "src_a", "src_b",
            (F.col("na") + F.col("nb")
             - F.coalesce("inter_exact", F.lit(0))).cast("long")
            .alias("union_exact"),
            F.coalesce("inter_exact", F.lit(0)).cast("long")
            .alias("inter_exact"))
    )
    return pairs.join(exact, ["src_a", "src_b"]).select(
        "src_a", "src_b", "union_est", "inter_est", "jaccard_est",
        "union_exact", "inter_exact")
