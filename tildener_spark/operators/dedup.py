"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (its only dedup is gazetteer-line uniqueness,
NEUtilities.pm:561-604); these are the web-scale document-level
operators a 100 TB corpus pipeline needs.  All hashing is md5-based
built-ins so every operator has an exact DuckDB oracle (SURVEY.md §5).

Scale design:
  * exact dedup — one hash aggregate, map-side partial combine free;
  * shingle/ngram joins — document-frequency cap on the join key
    (standard blocking-skew guard: a shingle appearing in >max_df docs
    generates O(max_df²) pairs — drop it, it has no discriminative
    value anyway) + AQE skew join;
  * minhash-LSH — b×r signature via md5 min (JVM codegen, no UDF),
    band-bucket equi-join instead of all-pairs;
  * simhash — 32-bit signature from per-token md5 hex-digit parity;
    hamming verification via integer XOR + bit_count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tildener_spark.config import EngineConfig
from tildener_spark.materialize import materialize_once
from tildener_spark.operators.linking import with_minhash_bands


def normalized_text(col):
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup.

    Returns one row per duplicate *group* (>=2 docs with identical
    normalized text): (text_hash, n_docs, representative) with
    representative = min id (deterministic)."""
    h = F.md5(normalized_text(F.col(text_col)))
    return (
        docs.select(F.col(id_col).alias("doc_id"), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("representative"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def word_shingles(col, n: int = 3):
    """Array of word n-gram strings (space-joined), distinct."""
    toks = F.split(normalized_text(col), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0),
                       F.greatest(F.lit(0), F.size(toks) - n)),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.8,
                        max_df: int = 1000) -> DataFrame:
    """Word-n-gram Jaccard near-duplicate pairs (a < b).

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) computed from a shared-shingle
    equi-join — never materializes the full pair matrix.  Shingles
    with document frequency > max_df are dropped (skew guard)."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))
    flat = sh.select("doc_id", "n_sh", F.explode("shingles").alias("s"))
    # NOTE: a per-shingle collect_list + higher-order-function pair
    # generation was tried here and is SLOWER for high-df shingles
    # (materializes up to max_df²/2 structs per group before the
    # explode); the streaming equi-self-join below pipelines pairs
    # through the hash aggregate without ever materializing them
    rare = (
        flat.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .filter(F.col("df") <= max_df)
        .drop("df")
        # both sides of the self-join read this; without
        # materialization the shingle construction + window run twice
        # (no cross-branch CSE in Spark).  Mode-aware: lazy
        # localCheckpoint in local mode (no handle to leak), persist
        # on a cluster so executor loss recomputes instead of failing
        # the job (ADVICE r02; tildener_spark/materialize.py).
    )
    rare = materialize_once(rare)
    a, b = rare.alias("a"), rare.alias("b")
    common = (
        a.join(b, "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      cfg: EngineConfig | None = None,
                      max_bucket: int = 100) -> DataFrame:
    """MinHash-LSH candidate pairs over char shingles (a < b).

    The scale path: O(docs × bands) explode + equi-join on the band
    key.  Buckets larger than max_bucket dropped (skew guard)."""
    cfg = cfg or EngineConfig()
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    banded = with_minhash_bands(d, text_col, cfg)
    flat = banded.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band"))
    small = (
        flat.withColumn(
            "bn", F.count(F.lit(1)).over(
                Window.partitionBy("band_idx", "band")))
        .filter(F.col("bn") <= max_bucket)
        # one banding pass instead of two (self-join sides); see
        # ngram_jaccard_pairs for the mode-aware materialization note
    )
    small = materialize_once(small)
    a, b = small.alias("a"), small.alias("b")
    return (
        a.join(b, ["band_idx", "band"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def simhash_bits(col, bits: int = 32):
    """32-bit SimHash as a bigint, from word-token md5 hex digits.

    bit j of the signature = majority over tokens of (hex digit j of
    md5(token) is odd).  Pure built-ins; DuckDB-mirrorable."""
    toks = F.array_distinct(F.split(normalized_text(col), " "))
    hashes = F.transform(toks, lambda t: F.md5(t))

    def bit(j: int):
        odd = F.size(
            F.filter(
                hashes,
                lambda h: F.substring(h, j + 1, 1).isin(
                    "1", "3", "5", "7", "9", "b", "d", "f"),
            )
        )
        return F.when(odd * 2 > F.size(hashes), F.lit(1)).otherwise(F.lit(0))

    expr = F.lit(0).cast("long")
    for j in range(bits):
        expr = expr + (bit(j).cast("long") * F.lit(1 << j))
    return expr


def simhash_duplicates(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: band the 32-bit signature into 4 bytes,
    equi-join on any equal byte, verify hamming distance <= k."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        simhash_bits(F.col(text_col)).alias("sig"),
    )
    bands = d.select(
        "doc_id", "sig",
        F.posexplode(F.array(*[
            F.shiftright("sig", 8 * i).bitwiseAND(F.lit(255))
            for i in range(4)
        ])).alias("band_idx", "band"),
        # the 32-bit signature expression is heavy — compute it once,
        # not once per self-join side (see ngram_jaccard_pairs)
    )
    bands = materialize_once(bands)
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(
        F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(b, ["band_idx", "band"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
