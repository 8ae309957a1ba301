"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

Training-data pipeline operators (not in the reference, which assumes
its language is given per run — Tag.pm:64).  All pure built-ins, each
with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tildener_spark.operators.dedup import (
    WS, WS_RE, normalized_text, shingles_from_tokens, word_tokens)

# tiny closed marker-word profiles (deterministic n-gram-heuristic
# stand-in for a real language-ID model)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "por"],
    "lv": ["un", "ir", "ar", "par", "kas", "tas", "no", "uz"],
}
STOPWORDS = LANG_PROFILES["en"]


def lang_scores(toks):
    """Per-language marker-hit counts from a token-array column.

    Callers stage the tokens as a projected column (dedup.word_tokens
    doc): the five per-language filters plus the argmax reference the
    array ~17 times, which as a raw expression re-runs regex+split
    per reference."""
    scores = {}
    for lang, words in LANG_PROFILES.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores[lang] = F.size(
            F.filter(toks, lambda t: F.array_contains(arr, t)))
    return scores


def detect_language(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """argmax over marker-hit counts; tie-break 'und' (undetermined)
    when the best score is 0, else lexicographically smallest lang."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        word_tokens(F.col(text_col)).alias("_toks"))
    scores = lang_scores(F.col("_toks"))
    pairs = F.array(*[
        F.struct(
            (-scores[lang]).alias("neg"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_PROFILES)
    ])
    best = F.array_min(pairs)
    return staged.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}")
          for lang in sorted(LANG_PROFILES)],
        F.when(-best["neg"] > 0, best["lang"]).otherwise(F.lit("und"))
        .alias("detected_lang"),
    )


def quality_features(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition quality features
    + a composite score in [0,1]."""
    text = F.col("_text")
    # the punct-strip regex is consumed twice (punct_ratio + the
    # composite score), so its count is staged alongside the tokens
    # (see word_tokens) — the output Project contains higher-order
    # lambdas, so it evaluates interpreted, without CSE
    src = F.col(text_col)
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        src.alias("_text"),
        word_tokens(src).alias("_toks"),
        (F.length(src)
         - F.length(F.regexp_replace(src, rf"[^\w{WS}]", "")))
        .alias("_n_punct"))
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.col("_n_punct")
    n_digit = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    n_uniq = F.size(F.array_distinct(toks))
    # raw (unrounded) ratios feed the composite; rounding happens only
    # at the output projection so the score is order-of-ops exact
    rep_ratio = 1 - n_uniq / F.greatest(n_tok, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    digit_ratio = n_digit / F.greatest(n_chars, F.lit(1))
    avg_tok_len = (
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
        / F.greatest(n_tok, F.lit(1)))
    # composite: long enough, not too repetitive, light punctuation
    score = (
        F.least(n_tok / F.lit(50.0), F.lit(1.0)) * 0.4
        + (1 - rep_ratio) * 0.4
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
    )
    return staged.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(rep_ratio, 6).alias("repetition_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (regex pieces:
    word chars split at ~4-char boundaries, digits, punctuation)."""
    text = F.col(text_col)
    ws = F.size(F.split(F.trim(text), WS_RE))
    # BPE-ish: every run of <=4 word chars, each digit run, each punct
    pieces = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(rf"[a-z]{{1,4}}|[0-9]+|[^a-z0-9{WS}]"), 0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        pieces.alias("subword_tokens"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 4) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-lite): the minimum
    md5 over word n-gram shingles + the shingle count.  Equal
    fingerprints => near-identical prefixes/content at much lower cost
    than full jaccard."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        word_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        shingles_from_tokens(F.col("_toks"), n).alias("_sh"),
    )
    return staged.select(
        "doc_id",
        F.array_min(
            F.transform(F.col("_sh"), lambda s: F.md5(s)))
        .alias("fingerprint"),
        F.size(F.col("_sh")).alias("n_shingles"),
    )


def top_keywords(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-document TF-IDF keyword extraction (top-k tokens).

    tf = token count in the doc, df = number of docs containing the
    token, score = tf * ln(N/df); output carries only the INTEGER
    tally columns (doc_id, token, tf, df, rank) so the DuckDB oracle
    hash cannot wobble on float formatting — the float score exists
    only transiently as the rank ordering key (ties broken by token
    asc, documented determinism).

    Scale shape: one hash aggregate to (doc, token) tf, one to token
    df; the df table is vocabulary-sized and broadcast back onto the
    tf table, so the only data-sized shuffle is the tf groupBy (which
    co-partitions with the final per-doc window by doc_id)."""
    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                    WS_RE, " ")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"))
    df = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"))
    scored = tf.join(F.broadcast(df), "token").withColumn(
        "score", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "rank")
    )


def repetition_profile(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition rules (Rae et al. 2021
    §A1.1): duplicate-line fraction, duplicate-line *character*
    fraction, and the character coverage of the heaviest word bigram.
    A page failing any threshold (0.30 / 0.20 / 0.18) is ``flagged``.

    Not in the reference (TildeNER assumes curated corpora,
    ProcessDirectory.pl:28-40); this is the web-crawl quality gate
    that would run ahead of it at CommonCrawl scale.

    Scale shape: everything is computed array-native per row with
    higher-order functions — NO shuffle, no UDF.  The heaviest-bigram
    search sorts the per-doc bigram array and folds a run-length
    maximum over it instead of explode+groupBy, so a 10^12-page run
    stays embarrassingly parallel (the per-doc cost is the sort of a
    doc-length array, the cross-doc cost is zero).

    Tie-insensitivity: the bigram metric is max(count * char_len)
    over distinct bigrams — a scalar max — so equal-count ties cannot
    make the output depend on comparison order (the DuckDB oracle
    computes the same max via unnest+group by).
    """
    staged = _stage_repetition(
        docs.select(F.col(id_col).alias(id_col), F.col(text_col)),
        text_col)
    m = _repetition_exprs()
    return staged.select(
        id_col,
        m["n_lines"].cast("bigint").alias("n_lines"),
        F.round(m["dup_line_frac"], 6).alias("dup_line_frac"),
        F.round(m["dup_char_frac"], 6).alias("dup_line_char_frac"),
        F.round(m["top_frac"], 6).alias("top_bigram_char_frac"),
        m["flagged"].alias("flagged"),
    )


def filter_repetitive(docs: DataFrame,
                      text_col: str = "text") -> DataFrame:
    """Drop rows failing the Gopher repetition rules, preserving the
    input schema — the pipeline pre-filter form of
    :func:`repetition_profile` (same expressions, same thresholds).
    Zero shuffle: a per-row filter the scan pushes through."""
    staged = _stage_repetition(docs, text_col)
    keep = ~_repetition_exprs()["flagged"]
    return staged.filter(keep).drop("_lines", "_words", "_top_cov")


def _stage_repetition(docs: DataFrame, text_col: str) -> DataFrame:
    """Append the staged repetition arrays (_lines, _words, _top_cov)
    to ``docs``.  Two projection stages: the arrays first (each is
    consumed several times downstream — staging discipline, see
    dedup.word_tokens), then the bigram run-length fold over _words."""
    text = F.col(text_col)
    staged = docs.select(
        "*",
        F.filter(
            F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
            lambda l: l != "").alias("_lines"),
        F.filter(
            F.split(F.trim(F.regexp_replace(text, WS_RE, " ")), " "),
            lambda w: w != "").alias("_words"),
    )
    words = F.col("_words")
    # bigram array -> sort -> run-length fold carrying the best
    # count*char_len seen (char_len = length minus the joining space)
    n_w = F.size(words)
    bigrams = F.when(
        n_w >= 2,
        F.zip_with(F.slice(words, 1, n_w - 1),
                   F.slice(words, 2, n_w - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
    ).otherwise(F.array().cast("array<string>"))
    zero = F.lit(0).cast("long")
    run_max = F.aggregate(
        F.array_sort(bigrams),
        F.struct(F.lit("").alias("prev"), zero.alias("cnt"),
                 zero.alias("best")),
        lambda s, x: F.when(
            x == s["prev"],
            F.struct(s["prev"].alias("prev"),
                     (s["cnt"] + 1).alias("cnt"),
                     s["best"].alias("best")),
        ).otherwise(
            F.struct(
                x.alias("prev"), F.lit(1).cast("long").alias("cnt"),
                F.greatest(
                    s["best"],
                    s["cnt"] * (F.length(s["prev"]) - 1)).alias("best"))),
        lambda s: F.greatest(
            s["best"], s["cnt"] * (F.length(s["prev"]) - 1)),
    )
    return staged.select("*", run_max.alias("_top_cov"))


def _repetition_exprs() -> dict:
    """Raw (unrounded) repetition metrics over the staged columns."""
    lines, words = F.col("_lines"), F.col("_words")
    chars_of = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    n_lines = F.size(lines)
    n_dist = F.size(F.array_distinct(lines))
    total_chars = chars_of(lines)
    dist_chars = chars_of(F.array_distinct(lines))
    word_chars = chars_of(words)
    dup_line_frac = (n_lines - n_dist) / F.greatest(n_lines, F.lit(1))
    dup_char_frac = (
        (total_chars - dist_chars)
        / F.greatest(total_chars, F.lit(1).cast("long")))
    top_frac = (
        F.col("_top_cov")
        / F.greatest(word_chars, F.lit(1).cast("long")))
    return {
        "n_lines": n_lines,
        "dup_line_frac": dup_line_frac,
        "dup_char_frac": dup_char_frac,
        "top_frac": top_frac,
        "flagged": ((dup_line_frac > 0.30) | (dup_char_frac > 0.20)
                    | (top_frac > 0.18)),
    }


# Gopher Table A1 thresholds (Rae et al. 2021): top n-gram char
# coverage for n=2..4, duplicated n-gram char fraction for n=5..10
TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12,
                        9: 0.11, 10: 0.10}


def _word_ngrams(words, n: int):
    """Space-joined word n-grams as an array column ([] when the doc
    has fewer than n words)."""
    if n == 1:
        return words
    n_w = F.size(words)
    return F.when(
        n_w >= n,
        F.transform(
            F.sequence(F.lit(1), n_w - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def _ngram_fold(ngrams, n: int, mode: str):
    """One sorted-array run-length fold (the q31 top-bigram idiom
    generalized): ``mode='top'`` returns max over distinct n-grams of
    count*char_len; ``mode='dup'`` returns the sum of count*char_len
    over n-grams occurring >= 2 times.  char_len = length(g) - (n-1)
    joining spaces, so the metric counts word characters only."""
    zero = F.lit(0).cast("long")
    spaces = F.lit(n - 1).cast("long")

    def contrib(s):
        chars = s["cnt"] * (F.length(s["prev"]) - spaces)
        if mode == "top":
            return F.greatest(s["acc"], chars)
        return s["acc"] + F.when(s["cnt"] >= 2, chars).otherwise(zero)

    return F.aggregate(
        F.array_sort(ngrams),
        F.struct(F.lit("").alias("prev"), zero.alias("cnt"),
                 zero.alias("acc")),
        lambda s, x: F.when(
            x == s["prev"],
            F.struct(s["prev"].alias("prev"),
                     (s["cnt"] + 1).alias("cnt"),
                     s["acc"].alias("acc")),
        ).otherwise(
            F.struct(x.alias("prev"),
                     F.lit(1).cast("long").alias("cnt"),
                     contrib(s).alias("acc"))),
        contrib,
    )


def ngram_repetition_profile(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """The FULL Gopher n-gram repetition rule set (Rae et al. 2021
    Table A1), completing :func:`repetition_profile`'s line+bigram
    subset: character coverage of the heaviest word n-gram for
    n=2,3,4 and the duplicated-n-gram character fraction for
    n=5..10, each against its published threshold; ``flagged`` when
    any rule fires.

    Definition note: the dup metric here is Σ count·char_len over
    n-grams occurring >= 2 times (the RedPajama-v2/Dolma-style
    accounting, overlapping occurrences each counted) divided by
    total word chars — NOT Gopher's position-union variant, whose
    once-per-character marking needs per-position state that an
    expression-only fold can't carry.  The difference only loosens
    the metric upward on self-overlapping runs; thresholds keep
    their screening role.  The value can exceed 1.0 on degenerate
    all-repeat pages for the same reason.

    Scale shape: 9 sorted-array run-length folds per row over staged
    token arrays — NO shuffle, NO UDF; per-doc cost is 9 array
    sorts, cross-doc cost zero, so a 10^12-page run stays
    embarrassingly parallel (same argument as repetition_profile).
    """
    staged = docs.select(
        F.col(id_col).alias(id_col),
        F.filter(
            F.split(F.trim(F.regexp_replace(F.col(text_col),
                                            WS_RE, " ")), " "),
            lambda w: w != "").alias("_words"))
    words = F.col("_words")
    staged = staged.select(
        id_col, "_words",
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda a, x: a + F.length(x)).alias("_wc"))
    denom = F.greatest(F.col("_wc"), F.lit(1).cast("long"))
    out_cols, flags = [], []
    for n, thr in TOP_NGRAM_THRESHOLDS.items():
        frac = _ngram_fold(_word_ngrams(words, n), n, "top") / denom
        out_cols.append(
            F.round(frac, 6).alias(f"top_{n}gram_char_frac"))
        flags.append(frac > thr)
    for n, thr in DUP_NGRAM_THRESHOLDS.items():
        frac = _ngram_fold(_word_ngrams(words, n), n, "dup") / denom
        out_cols.append(
            F.round(frac, 6).alias(f"dup_{n}gram_char_frac"))
        flags.append(frac > thr)
    flagged = flags[0]
    for f in flags[1:]:
        flagged = flagged | f
    return staged.select(
        id_col,
        F.size(words).cast("bigint").alias("n_words"),
        *out_cols,
        flagged.alias("flagged"))


def corpus_summary(docs: DataFrame, lang_col: str = "lang",
                   text_col: str = "text") -> DataFrame:
    """Per-language corpus report for mixture planning: document
    count, char/token totals, and EXACT length percentiles (p50/p90
    over chars and whitespace tokens).

    Spark's exact ``percentile`` interpolates identically to DuckDB's
    ``quantile_cont`` (bitwise, verified), which is what makes this
    oracle-checkable.  Scale note: exact percentile buffers the
    group's values — fine for language-cardinality groups at any doc
    count memory-wise only via its digest merge; at 10^12 docs swap
    in ``approx_percentile(col, p, accuracy)`` (same plan shape, no
    exact SQL mirror — which is why the checkable form is the
    default here)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), WS_RE))
    staged = docs.select(
        F.col(lang_col).alias("lang"),
        F.length(text_col).cast("long").alias("_chars"),
        ws.cast("long").alias("_toks"))
    return staged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_chars").cast("bigint").alias("total_chars"),
        F.sum("_toks").cast("bigint").alias("total_tokens"),
        F.round(F.expr("percentile(_chars, 0.5)"), 6).alias("p50_chars"),
        F.round(F.expr("percentile(_chars, 0.9)"), 6).alias("p90_chars"),
        F.round(F.expr("percentile(_toks, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(_toks, 0.9)"), 6).alias("p90_tokens"),
    )


def frequent_ngrams(docs: DataFrame, n: int = 3, k: int = 50,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Global top-k word n-grams by document frequency — the
    boilerplate/template discovery pass (the phrases that show up
    across thousands of pages are navigation chrome, cookie banners,
    and license blurbs; they feed remove_boilerplate allow-lists and
    n-gram-LM vocabulary induction).

    Returns (rank, ngram, df, total_tf): df = documents containing
    the n-gram at least once, total_tf = total occurrence count.
    Rank orders by (df desc, total_tf desc, ngram asc) — a total
    order, so the result is partitioning-invariant.

    Scale shape: per-doc DISTINCT shingles for df + per-doc counted
    shingles for tf combine into ONE exploded aggregate (map-side
    partial agg absorbs the head: 'click here to' appearing in every
    doc becomes one row per partition before the shuffle); the top-k
    is orderBy+limit, which Spark executes as TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows) — never a global
    sort or a single-partition window."""
    from tildener_spark.operators.dedup import (
        shingles_from_tokens, word_tokens)
    toks = docs.select(word_tokens(F.col(text_col)).alias("toks"))
    all_sh = toks.select(
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(F.lit(0), F.size("toks") - n)),
                    lambda i: F.concat_ws(
                        " ", *[F.try_element_at(F.col("toks"),
                                                i + j + 1)
                               for j in range(n)])),
                lambda s: s != "")).alias("ngram"))
    # guard sub-n-word docs: their single short shingle is real text,
    # keep it only if it has n words
    all_sh = all_sh.filter(
        F.size(F.split(F.col("ngram"), " ")) == n)
    per_ngram = all_sh.groupBy("ngram").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_tf"))
    df_sh = toks.select(
        F.explode(shingles_from_tokens(F.col("toks"), n))
        .alias("ngram")).filter(
        F.size(F.split(F.col("ngram"), " ")) == n)
    per_df = df_sh.groupBy("ngram").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"))
    top = (per_df.join(per_ngram, "ngram")
           .orderBy(F.col("df").desc(), F.col("total_tf").desc(),
                    F.col("ngram"))
           .limit(k))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("df").desc(), F.col("total_tf").desc(),
                       F.col("ngram"))
    # the window runs over the k collected rows only — bounded
    return top.withColumn(
        "rank", F.row_number().over(w).cast("bigint")).select(
        "rank", "ngram", "df", "total_tf")


def pmi_collocations(docs: DataFrame, text_col: str = "text",
                     min_count: int = 3, top_n: int = 200) -> DataFrame:
    """Corpus collocation mining: adjacent-bigram PMI (Church & Hanks
    1990) — the standard multi-word-expression / phrase-vocabulary
    signal (e.g. phrase merging before tokenizer training).

    ``pmi = round(ln(p(w1,w2) / (p(w1) p(w2))), 6)`` with bigram
    probability from the bigram-event total and unigram probabilities
    from the token total; emitted for bigrams with
    ``n12 >= min_count``, top ``top_n`` by (pmi desc, w1, w2).

    Determinism: all counts are exact bigints; the probability ratio
    is evaluated in the SAME association order on both engines
    (``(n12 * N / NB) * (N / (n1 * n2))`` — see oracle) and the one
    ``ln`` feeds a round(.,6), the engine-portability contract BM25
    (q51) and the LM scorer (q41) established.

    Scale shape: bigram extraction is a zero-shuffle array zip per
    row; unigram/bigram counts are wordcount-shape partial aggs;
    the scalar totals broadcast back; the unigram join keys are
    vocabulary-sized.  Top-n is TakeOrderedAndProject.
    """
    toks = docs.select(
        F.split(normalized_text(F.col(text_col)), " ").alias("toks"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    )
    bi_all = (
        toks.filter(F.size("toks") >= 2)
        .select(F.explode(F.zip_with(
            F.expr("slice(toks, 1, size(toks) - 1)"),
            F.expr("slice(toks, 2, size(toks) - 1)"),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2"))))
            .alias("bg"))
        .select("bg.w1", "bg.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n12"))
    )
    bi = bi_all.filter(F.col("n12") >= min_count)
    # totals over ALL events (the probability denominators), not the
    # min_count survivors
    totals = uni.agg(
        F.sum("n_w").cast("long").alias("n_tok")).crossJoin(
        bi_all.agg(F.sum("n12").cast("long").alias("n_bi")))
    scored = (
        bi
        .join(F.broadcast(uni.select(F.col("w").alias("w1"),
                                     F.col("n_w").alias("n1"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"),
                                     F.col("n_w").alias("n2"))), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", "n12", "n1", "n2",
            F.round(F.log(
                (F.col("n12") * F.col("n_tok") / F.col("n_bi"))
                * (F.col("n_tok") / (F.col("n1") * F.col("n2")))), 6)
            .alias("pmi"))
    )
    return (
        scored
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_n)
        .select("w1", "w2", "n12", "n1", "n2", "pmi")
    )
