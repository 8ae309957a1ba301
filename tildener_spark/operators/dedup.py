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
from tildener_spark.materialize import (
    ensure_min_parallelism, materialize_once)
from tildener_spark.operators.linking import with_minhash_bands

# Java regex \s matches vertical tab (\x0b); RE2's (DuckDB's)
# classically does not.  Every whitespace regex an oracle mirrors is
# pinned to this explicit class so Spark (Java) and DuckDB (RE2)
# agree on ALL inputs, not just \x0b-free ones.  The escape
# spellings (\t \n \x0b \f \r) are in the common Java/RE2 subset.
WS = r" \t\n\x0b\f\r"
WS_RE = rf"[{WS}]+"


def normalized_text(col):
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), WS_RE, " "))


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


def word_tokens(col):
    """Word-token array of the normalized text.

    Stage this as its OWN projected column before consuming it more
    than once (or inside a higher-order lambda): interpreted
    expression eval has no common-subexpression elimination, so every
    reference to the raw expression re-runs the regex+split — inside
    a ``transform`` lambda that means once per OUTPUT ELEMENT
    (measured 10x on the q11 shingle build, scripts/profile_q11.py).
    Catalyst's CollapseProject keeps the stage boundary (it never
    inlines a non-cheap alias referenced more than once)."""
    return F.split(normalized_text(col), " ")


def shingles_from_tokens(toks, n: int = 3):
    """Distinct word n-gram strings from a pre-projected token-array
    column.  ``concat_ws`` over ``try_element_at`` probes — no
    per-element slice allocation or array_join; out-of-range probes
    return null (``try_`` form: plain element_at THROWS out-of-range
    under Spark 4's default ANSI mode), which concat_ws skips,
    reproducing array_join's short-tail behavior on docs with < n
    words."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0),
                       F.greatest(F.lit(0), F.size(toks) - n)),
            lambda i: F.concat_ws(
                " ",
                *[F.try_element_at(toks, i + j + 1) for j in range(n)]),
        )
    )


def word_shingles(col, n: int = 3):
    """Array of word n-gram strings (space-joined), distinct.

    One-expression form (slice keeps the inner split to ONE eval per
    element); hot paths should stage :func:`word_tokens` as a column
    and use :func:`shingles_from_tokens` instead."""
    toks = word_tokens(col)
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
    docs = ensure_min_parallelism(docs)
    # tokens staged as a real column: ONE regex+split per doc (see
    # word_tokens) instead of one per shingle
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        word_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        shingles_from_tokens(F.col("_toks"), n).alias("shingles"),
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
    d = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
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


def cross_doc_dup_score(docs: DataFrame, n: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Cross-document duplication score per document: the fraction of
    its distinct n-token windows that also occur in ANOTHER document
    (the corpus-level cousin of the within-doc Gopher repetition
    rules, textstats.py — a high score marks boilerplate-heavy or
    templated pages even when no whole-document near-dup fires).

    Output: (id, n_windows, n_shared, dup_frac) for every input row;
    documents shorter than n tokens get n_windows = 0, dup_frac = 0.

    Scale shape: distinct (doc, window-hash) pairs -> count docs per
    hash (partial agg absorbs universal-window skew) -> join the
    shared hashes back (row count bounded by windows per doc) -> one
    per-doc aggregate.  No all-pairs path; everything keys on the
    window hash exactly like the decontamination join
    (operators/contamination.py)."""
    from tildener_spark.operators.contamination import _shingle_keys
    sh = _shingle_keys(docs, id_col, text_col, n, id_col)
    shared = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("sh")
    )
    n_shared = (
        sh.join(shared, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    n_windows = sh.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"))
    return (
        docs.select(id_col)
        .join(n_windows, id_col, "left")
        .join(n_shared, id_col, "left")
        .na.fill(0, ["n_windows", "n_shared"])
        .withColumn(
            "dup_frac",
            F.when(F.col("n_windows") > 0,
                   F.round(F.col("n_shared") / F.col("n_windows"), 6))
            .otherwise(F.lit(0.0)))
    )


def near_dup_clusters(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      cfg: EngineConfig | None = None,
                      max_bucket: int = 100) -> DataFrame:
    """The dedup END ARTIFACT: cluster near-duplicates and pick one
    representative per cluster.

    Candidate pairs alone (:func:`minhash_lsh_pairs`) don't dedup a
    corpus — transitive chains (A~B, B~C) must collapse into ONE kept
    document.  This composes the LSH pairs with connected components
    (operators/components.py) and labels every document:
    (id, cluster, keep) where cluster is the lexicographically
    smallest member id (the CC label; singletons are their own
    cluster) and keep is true exactly for the representative.  A
    different survivor rule (longest text, newest crawl) is a drop-in
    replacement for the ``keep`` expression.

    Scale: pairs stage as documented on minhash_lsh_pairs; CC input is
    bounded by the near-duplicate pair count, not corpus size."""
    from tildener_spark.operators.components import connected_components
    pairs = minhash_lsh_pairs(docs, id_col, text_col, cfg, max_bucket)
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst")), cfg)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("cluster", F.coalesce("component", F.col("doc_id")))
        .withColumn("keep", F.col("cluster") == F.col("doc_id"))
        .select("doc_id", "cluster", "keep")
    )


def token_md5s(col):
    """md5 hex digests of the distinct word tokens — the shared input
    of the per-bit SimHash majorities.  Stage as a column (see
    :func:`word_tokens`): :func:`simhash_from_hashes` references it
    2 x bits times, which as a raw expression would md5 the whole
    token array 2 x bits times per row."""
    return F.transform(
        F.array_distinct(F.split(normalized_text(col), " ")),
        lambda t: F.md5(t))


def simhash_from_hashes(hashes, bits: int = 32):
    """SimHash bigint from a pre-projected token-md5 array column.

    bit j of the signature = majority over tokens of (hex digit j of
    md5(token) is odd).  Pure built-ins; DuckDB-mirrorable."""

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


def simhash_bits(col, bits: int = 32):
    """One-expression SimHash (oracle-parity form).  Hot paths must
    stage :func:`token_md5s` as a column and call
    :func:`simhash_from_hashes` — inlined here, every per-bit
    majority re-evaluates the md5 transform."""
    return simhash_from_hashes(token_md5s(col), bits)


def simhash_duplicates(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: band the 32-bit signature into 4 bytes,
    equi-join on any equal byte, verify hamming distance <= k."""
    docs = ensure_min_parallelism(docs)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        token_md5s(F.col(text_col)).alias("_h"),
    ).select(
        "doc_id",
        simhash_from_hashes(F.col("_h")).alias("sig"),
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


def dup_span_removal(docs: DataFrame, n: int = 5,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Cross-document duplicated-SPAN removal (the ExactSubstr dedup
    of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", at token granularity): any n-token window that
    also appears in another document marks its token range as
    duplicated; overlapping/adjacent ranges merge into maximal spans;
    the document is re-emitted with those spans cut out.

    Where :func:`cross_doc_dup_score` only *measures* cross-doc
    duplication and :func:`near_dup_clusters` drops whole documents,
    this is the surgical variant that keeps the unique remainder of
    every document — the form actually used for LLM training corpora
    (a boilerplate header shared by 10k pages disappears from all of
    them, the articles underneath survive).

    Output, one row per input doc:
      (doc_id, n_tokens, n_spans, dup_tokens, dup_ratio, kept_text)
    kept_text is the space-join of surviving tokens (token-granular
    reconstruction; original inter-token whitespace is not kept).

    Scale shape: windows carry an 8-byte xxhash64 key, not the gram
    string, so the duplicate-detection shuffle moves fixed-width keys
    (the DuckDB oracle joins the literal grams — the output contains
    no gram keys, so the two agree unless xxhash64 collides, ~n²/2⁶⁴).
    Cost: one hash aggregate over windows, one join back, two
    doc-local ordered-window passes; span merge and reconstruction
    are higher-order array ops on the doc row — no per-token shuffle,
    no UDF.  Tokens are case-sensitive (exact-substring semantics);
    the whitespace class is the pinned WS_RE."""
    toks_col = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.trim(F.col(text_col)), WS_RE))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       toks_col.alias("toks"))

    grams = (
        base.filter(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(F.expr(
                f"transform(sequence(0, size(toks) - {n}), "
                f"i -> struct(i as pos, "
                f"xxhash64(concat_ws(' ', slice(toks, i + 1, {n}))) as gk))"
            )).alias("g"))
        .select("doc_id", "g.pos", "g.gk")
    )
    shared = (
        grams.groupBy("gk")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("gk")
    )
    hits = grams.join(shared, "gk").select("doc_id", "pos")

    # gaps-and-islands: a hit opens a new span iff it starts past the
    # furthest end seen so far in this doc (adjacent spans merge)
    w_prev = (Window.partitionBy("doc_id").orderBy("pos")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy("doc_id").orderBy("pos")
             .rowsBetween(Window.unboundedPreceding, 0))
    islands = (
        hits
        .withColumn("_new", (F.col("pos") > F.coalesce(
            F.max(F.col("pos") + n).over(w_prev), F.lit(-1))).cast("int"))
        .withColumn("_isl", F.sum("_new").over(w_run))
        .groupBy("doc_id", "_isl")
        .agg(F.min("pos").alias("s"), (F.max("pos") + n).alias("e"))
    )
    doc_spans = (
        islands.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e")))
             .alias("spans"),
             F.count(F.lit(1)).cast("bigint").alias("n_spans"),
             F.sum(F.col("e") - F.col("s")).cast("bigint")
             .alias("dup_tokens"))
    )

    out = base.join(doc_spans, "doc_id", "left")
    kept_text = F.expr(
        "concat_ws(' ', transform(filter("
        "  transform(toks, (t, i) -> struct(t as t, i as i)),"
        "  x -> spans is null or"
        "       not exists(spans, sp -> x.i >= sp.s and x.i < sp.e)"
        "), x -> x.t))")
    return out.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.when(F.size("toks") > 0,
               F.round(F.coalesce("dup_tokens", F.lit(0))
                       / F.size("toks"), 6))
        .otherwise(F.lit(0.0)).alias("dup_ratio"),
        kept_text.alias("kept_text"),
    )


def incremental_dedup(old_docs: DataFrame, new_docs: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      cfg: EngineConfig | None = None,
                      max_bucket: int = 100) -> DataFrame:
    """Snapshot-ingestion dedup: flag each NEW document that LSH-
    collides with the EXISTING corpus — the monthly-Common-Crawl
    workflow (every new snapshot is mostly re-crawls of pages already
    held; index-side dedup runs before any expensive processing).

    Returns one row per new document: (doc_id, is_dup, n_matches,
    first_match) with first_match = the smallest matching old id
    (deterministic).  Candidates are band-bucket collisions, the same
    evidence level as minhash_lsh_pairs/q13b; an exact-Jaccard verify
    (q11's join) composes on top when the keep decision needs it.

    Scale shape: both sides band once (Arrow-batched numpy minhash,
    the q13c production path); the join is banded new x old flat
    tables on (band_idx, band_key) — at 10^12 held docs the OLD side
    is the big one, so the skew guard caps OLD buckets (a universal
    boilerplate bucket in the index would otherwise match every new
    doc); new-side counts are snapshot-sized.  The old flat table is
    exactly what a persisted LSH INDEX stores — re-banding is shown
    here only because the oracle replays from raw text.
    """
    cfg = cfg or EngineConfig()

    def flat(d):
        banded = with_minhash_bands(
            d.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col)), text_col, cfg)
        return banded.select(
            "doc_id", F.posexplode("bands").alias("band_idx", "band"))

    old_cap = (flat(old_docs)
               .withColumn("bn", F.count(F.lit(1)).over(
                   Window.partitionBy("band_idx", "band")))
               .filter(F.col("bn") <= max_bucket))
    cand = (flat(new_docs).alias("n")
            .join(old_cap.alias("o"), ["band_idx", "band"])
            .select(F.col("n.doc_id").alias("new_id"),
                    F.col("o.doc_id").alias("old_id"))
            .distinct())
    agg = cand.groupBy("new_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("old_id").alias("first_match"))
    return (new_docs.select(F.col(id_col).alias("doc_id"))
            .join(agg, F.col("doc_id") == F.col("new_id"), "left")
            .select(
                "doc_id",
                F.col("new_id").isNotNull().alias("is_dup"),
                F.coalesce("n_matches", F.lit(0).cast("long"))
                .alias("n_matches"),
                "first_match"))


def bloom_positions(col, m: int = 1 << 20, k: int = 4):
    """Array of k Bloom bit positions for a text column.

    Deterministic double-hash-free construction: position i =
    md5(md5(text) ':' i) taken as a 60-bit integer mod m.  Everything
    is built-ins (md5 + conv), so the filter is bitwise reproducible
    across engines — the DuckDB oracle replays the identical bits.
    """
    h = F.md5(col)
    return F.array(*[
        (F.conv(F.substring(F.md5(F.concat(h, F.lit(f":{i}"))),
                            1, 15), 16, 10).cast("long") % m)
        for i in range(k)])


def bloom_prefilter(held_docs: DataFrame, new_docs: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    m: int = 1 << 20, k: int = 4,
                    via: str = "bitmap") -> DataFrame:
    """Bloom-filter membership pre-dedup of a new snapshot against a
    held corpus — the cheap gate BEFORE exact/LSH verification.

    Returns one row per new document: (doc_id, maybe_dup, n_hits).
    ``maybe_dup`` has NO false negatives (an exact duplicate of any
    held text always has all k bits set — the property the test
    pins); false positives are bounded by the classic
    (1 - e^(-kn/m))^k and are resolved by the downstream exact check
    (q10/q64), which now runs on a tiny candidate slice instead of
    the whole snapshot.

    Scale shape (``via="bitmap"``, the production path): the held
    corpus aggregates to an m-bit numpy bitmap on the driver
    (m = 2^33 bits = 1 GiB covers 10^9 held docs at k=4 with ~2.4%
    FP) shipped once per executor via ``sc.broadcast``; membership is
    then a map-only Arrow pass over the snapshot — ZERO join, zero
    shuffle on the 100 TB side.  ``via="join"`` keeps the same answer
    as a pure-DataFrame distinct-positions left join (what the DuckDB
    oracle replays); the two paths are asserted equal in tests.
    """
    held_pos = (held_docs
                .select(F.explode(bloom_positions(
                    F.col(text_col), m, k)).alias("pos"))
                .distinct())
    new_pos = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(bloom_positions(F.col(text_col), m, k))
        .alias("slot", "pos"))
    if via == "join":
        joined = new_pos.join(
            held_pos.withColumn("present", F.lit(1)), "pos", "left")
        agg = joined.groupBy("doc_id").agg(
            F.sum(F.coalesce("present", F.lit(0))).alias("n_hits"))
        return agg.select(
            "doc_id", (F.col("n_hits") == k).alias("maybe_dup"),
            F.col("n_hits").cast("long").alias("n_hits"))
    if via != "bitmap":
        raise ValueError("via must be 'bitmap' or 'join'")
    import numpy as np
    import pandas as pd

    spark = new_docs.sparkSession
    # build the bitmap: collect DISTINCT set positions (bounded by
    # k * n_held <= m) via Arrow, pack to m/8 bytes
    pos_arr = held_pos.toArrow().column("pos").to_numpy()
    bitmap = np.zeros(m // 8 + 1, dtype=np.uint8)
    np.bitwise_or.at(bitmap, pos_arr // 8,
                     np.left_shift(1, (pos_arr % 8).astype(np.uint8)))
    bc = spark.sparkContext.broadcast(bitmap)

    from pyspark.sql import types as T

    def _n_hits(positions):
        bm = bc.value
        out = np.empty(len(positions), dtype=np.int32)
        for i, pos_list in enumerate(positions):
            p = np.asarray(pos_list, dtype=np.int64)
            out[i] = int(((bm[p // 8] >> (p % 8)) & 1).sum())
        return pd.Series(out)

    # no annotations: `from __future__ import annotations` turns
    # hints into strings pandas_udf can't resolve for local imports
    n_hits_udf = F.pandas_udf(_n_hits, T.IntegerType())

    return (new_docs
            .select(F.col(id_col).alias("doc_id"),
                    bloom_positions(F.col(text_col), m, k).alias("bp"))
            .select("doc_id", n_hits_udf("bp").alias("hits"))
            .select("doc_id",
                    (F.col("hits") == k).alias("maybe_dup"),
                    F.col("hits").cast("long").alias("n_hits")))
