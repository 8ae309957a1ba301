"""Mergeable cardinality sketches — from-scratch HyperLogLog
(Flajolet et al. 2007) with every step engine-portable.

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
