"""C4-style page cleaning (Raffel et al. 2020, §2.2 "C4").

Training-data pipeline operator (not in the reference, which assumes
curated corpora — ProcessDirectory.pl:28-40): the canonical
line-level + page-level heuristic filter that produced C4 from
Common Crawl, re-expressed as pure Spark expressions.

Line rules (each line is trimmed of leading/trailing ``[ \\t\\r]``
once up front; a trimmed line survives iff ALL hold):
  * ends in terminal punctuation — ``. ! ? "`` (C4's
    ``_END_MARKS``);
  * has at least ``min_words_per_line`` words (C4 default 5), words
    split on explicit ``[ \\t]+`` (pinned char class, not ``\\s`` —
    Java vs RE2 ``\\s`` disagree on ``\\x0b``);
  * does not contain the word "javascript" (case-insensitive);
  * does not contain a cookie/policy phrase (C4's list: "terms of
    use", "privacy policy", "cookie policy", "uses cookies",
    "use of cookies", "use cookies").

Page rules (after line filtering, the page is dropped — ``kept =
false`` — iff any holds, first match wins for ``drop_reason``):
  * ``lorem_ipsum``: lowercased original text contains
    "lorem ipsum";
  * ``brace``: original text contains ``{`` (code-page proxy);
  * ``badword``: any surviving line contains a blocklist word
    (tiny deterministic placeholder list — production swaps in the
    real blocklist, same plan);
  * ``too_few_lines``: fewer than ``min_lines`` surviving lines
    (C4 keeps pages with >= 3 sentences; we count retained lines,
    documented simplification — no sentence tokenizer in-container).

Scale shape: one ``split`` + higher-order array filters per row —
NO shuffle, NO UDF, whole-stage codegen end to end; at 10^12 pages
this is embarrassingly parallel and the scan's column pruning keeps
only (url, text) resident.  Every predicate uses engine-agnostic
primitives (``contains``/``like`` semantics identical in DuckDB), so
the oracle replays the exact rule set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# C4's cookie/policy phrase list (c4_utils.py in the public T5 repo)
POLICY_PHRASES = [
    "terms of use", "privacy policy", "cookie policy",
    "uses cookies", "use of cookies", "use cookies",
]

# deterministic placeholder for the C4 badwords blocklist
BADWORDS = ["badword1", "badword2"]

TERMINAL = [".", "!", "?", '"']


def _line_keep(t):
    """Predicate over one TRIMMED line (leading/trailing [ \\t\\r]
    already stripped by the staging transform, so the expensive
    regexp runs once per line — plan-audit DUP-EXPR discipline)."""
    lt = F.lower(t)
    words = F.filter(F.split(t, r"[ \t]+"), lambda w: w != "")
    ends_ok = F.substring(t, -1, 1).isin(TERMINAL)
    no_js = ~lt.contains("javascript")
    no_policy = ~F.greatest(
        *[lt.contains(p) for p in POLICY_PHRASES])
    return ends_ok & (F.size(words) >= F.lit(5)) & no_js & no_policy


def c4_clean(pages: DataFrame, id_col: str = "url",
             text_col: str = "text", min_lines: int = 3) -> DataFrame:
    """Apply the C4 rule set; returns one row per input page:
    (url, n_lines, n_kept, kept, drop_reason, text_clean).

    ``text_clean`` is the newline-join of surviving lines ('' when
    none survive or the page is dropped — dropped pages still
    surface, the ADVICE.md q34 lesson)."""
    text = F.col(text_col)
    staged = pages.select(
        F.col(id_col).alias("url"),
        text.alias("_text"),
        # trim each line ONCE here; every downstream rule then works
        # on the bound lambda variable with no regexp re-expansion
        F.filter(
            F.transform(
                F.split(text, "\n"),
                lambda l: F.regexp_replace(
                    l, r"^[ \t\r]+|[ \t\r]+$", "")),
            lambda t: t != "")
        .alias("_lines"))
    staged = staged.select(
        "url", "_text",
        F.size("_lines").cast("bigint").alias("n_lines"),
        F.filter(F.col("_lines"), _line_keep).alias("_kept_lines"))

    lower_all = F.lower(F.col("_text"))
    kept_join = F.array_join(F.col("_kept_lines"), "\n")
    bad_arr = F.array(*[F.lit(b) for b in BADWORDS])
    has_bad = F.exists(
        F.col("_kept_lines"),
        lambda l: F.exists(bad_arr,
                           lambda b: F.lower(l).contains(b)))
    reason = (
        F.when(lower_all.contains("lorem ipsum"), "lorem_ipsum")
        .when(F.col("_text").contains("{"), "brace")
        .when(has_bad, "badword")
        .when(F.size("_kept_lines") < min_lines, "too_few_lines"))
    return staged.select(
        "url", "n_lines",
        F.size("_kept_lines").cast("bigint").alias("n_kept"),
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
        F.when(reason.isNull(), kept_join).otherwise("")
        .alias("text_clean"))


def filter_c4(pages: DataFrame, id_col: str = "url",
              text_col: str = "text",
              min_lines: int = 3) -> DataFrame:
    """Pipeline pre-filter form: keep surviving pages with their
    cleaned text in ``text_col``, preserving the input schema."""
    out = c4_clean(pages, id_col=id_col, text_col=text_col,
                   min_lines=min_lines)
    kept = out.filter(F.col("kept")).select(
        F.col("url").alias(id_col),
        F.col("text_clean").alias(text_col))
    others = [c for c in pages.columns if c not in (id_col, text_col)]
    if not others:
        return kept
    return kept.join(pages.drop(text_col), on=id_col, how="inner") \
        .select(id_col, text_col, *others)
