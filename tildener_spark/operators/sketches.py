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
