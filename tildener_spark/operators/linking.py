"""Entity linking: blocking + candidate scoring + alias resolution.

New-engine stage (north_rule): link alias mentions (e.g. bare last
name "Bērziņš") to their canonical antecedent ("Jānis Bērziņš").

Two candidate generators, both pure DataFrame:

  1. **within-document token blocking** — mentions of the same url +
     ne_type sharing a full token.  The join key is (url, token), so
     it is co-partitioned by url and cannot skew globally (a head
     token like "SIA" only fans out within one document).
  2. **global minhash-LSH blocking** over character shingles — the
     scale path for cross-document near-duplicate surfaces (typos,
     diacritic variants).  b bands × r rows; banding via md5 built-ins
     (JVM-side, whole-stage codegen, no UDF).  Band buckets with more
     than ``max_bucket`` members are dropped (standard LSH skew
     guard); AQE skew-join handles the rest.

Scoring: token-containment (score 0.95) or Jaro-Winkler similarity —
vectorized pandas UDF over the candidate pair batch (the only Python
in this stage).  An alias resolves to the best-scoring antecedent,
ties broken by proximity (most recent preceding mention), then
lexicographically — documented determinism (SURVEY.md §4.3.4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType

from tildener_spark.config import EngineConfig


# ------------------------------------------------------- jaro-winkler

def _jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(la, lb) // 2 - 1
    ma = [False] * la
    mb = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    # transpositions
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3


def jaro_winkler_py(a: str, b: str, prefix_weight: float = 0.1) -> float:
    j = _jaro(a, b)
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return j + prefix * prefix_weight * (1 - j)


@F.pandas_udf(DoubleType())
def jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler_py(x or "", y or "") for x, y in zip(a, b)]
    )


# ------------------------------------------------- minhash-LSH blocking

def with_minhash_bands(df: DataFrame, text_col: str,
                       cfg: EngineConfig | None = None,
                       out_col: str = "bands") -> DataFrame:
    """Add array<bigint> LSH band keys over char-shingles of text_col.

    All JVM built-ins: shingles via sequence+transform+substring,
    per-hash minima via seeded murmur3 ``F.hash`` (integer ops — an
    earlier md5-string variant measured ~10x slower), band key =
    hash of the row's minima + band id.  No Python.
    """
    cfg = cfg or EngineConfig()
    k = cfg.shingle_size
    low = F.lower(F.col(text_col))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(low) - k + 1)),
            lambda i: low.substr(i, F.lit(k)),
        )
    )
    df = df.withColumn("_sh", shingles)
    n_hash = cfg.minhash_rows * cfg.minhash_bands

    def _minhash(i: int):
        return F.array_min(
            F.transform(F.col("_sh"), lambda s: F.hash(s, F.lit(i)))
        )

    minhashes = [_minhash(i) for i in range(n_hash)]
    bands = F.array(*[
        F.hash(*minhashes[b * cfg.minhash_rows:(b + 1) * cfg.minhash_rows],
               F.lit(b))
        for b in range(cfg.minhash_bands)
    ]).cast("array<bigint>")
    return df.withColumn(out_col, bands).drop("_sh")


def lsh_candidate_pairs(entities: DataFrame, cfg: EngineConfig | None = None,
                        id_col: str = "surface", type_col: str = "ne_type",
                        max_bucket: int = 50) -> DataFrame:
    """Global near-duplicate surface pairs via banded minhash join.

    entities: distinct (ne_type, surface). Returns (ne_type, a, b)
    with a < b.  Buckets larger than max_bucket are dropped (skew
    guard; logged upstream via observe counters)."""
    cfg = cfg or EngineConfig()
    e = with_minhash_bands(entities, id_col, cfg)
    exploded = e.select(
        type_col, F.col(id_col), F.explode("bands").alias("band")
    )
    small = (
        exploded.withColumn(
            "bucket_n", F.count(F.lit(1)).over(Window.partitionBy(type_col, "band")))
        .filter(F.col("bucket_n") <= max_bucket)
        .drop("bucket_n")
        # both sides of the self-join read this; without persist the
        # minhash banding (the expensive interpreted part) runs twice
        .persist()
    )
    a = small.alias("a")
    b = small.alias("b")
    return (
        a.join(b, [type_col, "band"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            type_col,
            F.col(f"a.{id_col}").alias("a"),
            F.col(f"b.{id_col}").alias("b"),
        )
        .distinct()
    )


# --------------------------------------------- within-doc alias linking

def alias_links(mentions: DataFrame,
                cfg: EngineConfig | None = None,
                initialisms: frozenset[str] | set[str] = frozenset()) -> DataFrame:
    """Resolve alias mentions to antecedents within each document.

    Returns one row per resolved alias *surface*:
      (url, ne_type, alias, canonical, score)

    Candidates: same (url, ne_type), different surface, sharing a full
    token (blocking join on (url, ne_type, token) — co-partitioned by
    url).  Accept when alias tokens ⊆ antecedent tokens (score 0.95)
    or Jaro-Winkler ≥ cfg.link_min_score; the shorter surface is the
    alias.  Best antecedent per alias occurrence by (score desc,
    preceding-and-nearest, surface).

    ``initialisms`` (the gazetteer's ORG_INIT entries, e.g. SIA/AS)
    are excluded from blocking and scoring: "SIA Grauds" must NOT
    link to "SIA Banka" off the shared initialism, and "Banka" must
    link to "SIA Banka" via containment of *content* tokens."""
    cfg = cfg or EngineConfig()
    inits = F.array(*[F.lit(x) for x in sorted(initialisms)]) \
        if initialisms else F.array().cast("array<string>")
    m = (
        mentions.select(
            "url", "ne_type", "surface", "begin_tok",
            F.array_except(F.split(F.col("surface"), " "), inits)
            .alias("toks"),
        )
        .filter(F.size("toks") > 0)
    )
    tok = m.select(
        "url", "ne_type", "surface", "begin_tok", "toks",
        F.explode("toks").alias("tk"),
    )
    a = tok.alias("a")
    c = tok.select("url", "ne_type", "surface", "begin_tok", "toks", "tk") \
           .alias("c")
    pairs = (
        a.join(c, ["url", "ne_type", "tk"])
        .filter(
            (F.col("a.surface") != F.col("c.surface"))
            & (F.size("a.toks") <= F.size("c.toks"))
            & (F.length("a.surface") < F.length("c.surface"))
        )
        .select(
            "url", "ne_type",
            F.col("a.surface").alias("alias"),
            F.col("a.begin_tok").alias("alias_tok"),
            F.col("a.toks").alias("alias_toks"),
            F.col("c.surface").alias("canonical"),
            F.col("c.begin_tok").alias("canon_tok"),
            F.col("c.toks").alias("canon_toks"),
        )
        # NOTE: no distinct() here — pairs sharing several tokens
        # appear multiple times, but the per-occurrence row_number and
        # the per-alias majority groupBy below collapse duplicates; a
        # distinct over rows carrying array columns is a gratuitous
        # wide shuffle
    )
    # Acceptance is containment-first: an alias must be a strict
    # sub-phrase of its antecedent ("Bērziņš" ⊂ "Jānis Bērziņš").
    # Jaro-Winkler is allowed only for single-token vs single-token
    # pairs (typo/diacritic variants) at a high bar — full names that
    # merely share a first name ("Elīna Rozīte" / "Elīna Balodis")
    # must NOT link.
    contained = F.size(F.array_except("alias_toks", "canon_toks")) == 0
    single_pair = (F.size("alias_toks") == 1) & (F.size("canon_toks") == 1)
    # Split the scoring paths so the pandas UDF only ever sees the
    # single-token-vs-single-token slice (typo variants) — running
    # Python over the full candidate set would dominate the stage:
    #   contained            -> score 0.95, no UDF
    #   single & !contained  -> Jaro-Winkler UDF, tiny row count
    #   everything else      -> cannot link, dropped JVM-side
    cont_scored = pairs.filter(contained).withColumn(
        "score", F.lit(0.95))
    jw_scored = (
        pairs.filter(~contained & single_pair)
        .withColumn(
            "score",
            jaro_winkler(
                F.lower(F.array_join("alias_toks", " ")),
                F.lower(F.array_join("canon_toks", " ")),
            ),
        )
        .filter(F.col("score") >= cfg.typo_min_score)
    )
    scored = cont_scored.unionByName(jw_scored)
    # best antecedent per alias occurrence: highest score, then nearest
    # preceding (largest canon_tok < alias_tok), then lexicographic
    pref = F.when(F.col("canon_tok") < F.col("alias_tok"),
                  F.col("canon_tok") - F.col("alias_tok")) \
            .otherwise(F.lit(-(1 << 40)) - F.col("canon_tok"))
    w = Window.partitionBy("url", "ne_type", "alias", "alias_tok").orderBy(
        F.desc("score"), F.desc(pref), F.asc("canonical"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    # one canonical per alias surface per doc: majority over occurrences,
    # tie -> lexicographic
    agg = (
        best.groupBy("url", "ne_type", "alias", "canonical")
        .agg(F.count(F.lit(1)).alias("n"), F.max("score").alias("score"))
    )
    w2 = Window.partitionBy("url", "ne_type", "alias").orderBy(
        F.desc("n"), F.desc("score"), F.asc("canonical"))
    return (
        agg.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select("url", "ne_type", "alias", "canonical", "score")
    )
