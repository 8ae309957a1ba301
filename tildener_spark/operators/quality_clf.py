"""FineWeb/DCLM-style hashed n-gram quality classifier.

Model-based quality filtering (a fastText-ish linear classifier over
hashed word uni+bigrams, FineWeb-Edu / DCLM shape) is the standard
last filter of a web-scale LLM training pipeline.  The reference has
no learned document filter (its quality gate is the refinement
alphabet, NETagPlaintext.pl:33); this is part of the
beyond-reference training-data surface.

No trained weights ship with the engine: the weight of a feature is
DERIVED from the feature string itself (first 8 hex chars of
md5(seed|feature) read as uint32, centred to [-2^31, 2^31)).  That
keeps the operator fully deterministic and lets the DuckDB oracle
(q50) re-derive the identical model IN SQL — swapping in real learned
weights is a one-line change (join a broadcast weight table instead
of the md5 derivation; the feature extraction, margin sum and
sigmoid are unchanged).

Numeric discipline: per-feature weights are exact INTEGERS, so the
document margin is an order-independent integer sum and the keep
decision (margin >= 0 ⇔ sigmoid >= 0.5) is integer-exact across
engines.  Only the reported sigmoid score touches floats — one
division and one exp over bitwise-identical inputs, wrapped in
round(.,6) (the q41 absorption argument).

Scale shape: everything is per-row built-in expressions inside
whole-stage codegen — transform/aggregate over the token array, no
explode, no shuffle, no UDF.  At 100 TB this is a map-only pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tildener_spark.operators.dedup import WS_RE

_CENTER = 2_147_483_648  # 2^31: uint32 weight -> centred integer


def _toks_col(text_col: str):
    """Lowercased pinned-whitespace token array ('' -> empty).

    Built with the column API (NOT an F.expr SQL literal): the pinned
    whitespace class contains \\x0b, which Spark's SQL string-literal
    parser would mangle (unknown escapes drop the backslash, turning
    the class into one matching the letters x/0/b)."""
    t = F.trim(F.col(text_col))
    return F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(F.lower(t), WS_RE))


# staged over a `toks` column; sequence() is guarded (Spark's
# sequence(1, 0) counts DOWN, so size<2 must short-circuit)
_FEATURES_EXPR = """
    concat(
        transform(toks, t -> concat('u:', t)),
        case when size(toks) >= 2 then
            transform(sequence(1, size(toks) - 1),
                      i -> concat('b:', element_at(toks, i),
                                  '_', element_at(toks, i + 1)))
        else array() end
    )
"""


def classify_quality(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", seed: str = "qc50",
                     gain: float = 6.0) -> DataFrame:
    """Score every document with the hashed-ngram linear model.

    Output: (id_col, n_features, margin, score, keep) where margin is
    the exact integer weight sum, score = round(sigmoid(gain * mean
    normalized margin), 6) and keep ⇔ margin >= 0 (integer-exact, no
    float boundary).
    """
    d = (docs.select(F.col(id_col), _toks_col(text_col).alias("toks"))
         .select(F.col(id_col), F.expr(_FEATURES_EXPR).alias("_feats")))
    margin = F.expr(
        "aggregate(_feats, cast(0 as bigint), (acc, f) -> acc + ("
        f"cast(conv(substring(md5(concat('{seed}', '|', f)), 1, 8),"
        f" 16, 10) as bigint) - {_CENTER}))"
    )
    n = F.size("_feats").cast("bigint")
    mean = (F.col("margin").cast("double")
            / (F.col("n_features").cast("double") * float(_CENTER)))
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(float(gain)) * mean)),
        6)
    return (
        d.select(F.col(id_col), n.alias("n_features"),
                 margin.alias("margin"))
        .select(
            id_col, "n_features", "margin",
            F.when(F.col("n_features") > 0, score)
            .otherwise(F.lit(0.5)).alias("score"),
            (F.col("margin") >= 0).alias("keep"))
    )


def filter_quality(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", seed: str = "qc50") -> DataFrame:
    """Keep-only form for pipeline use: docs whose margin >= 0."""
    kept = classify_quality(docs, text_col, id_col, seed) \
        .filter("keep").select(id_col)
    return docs.join(kept, id_col, "left_semi")
