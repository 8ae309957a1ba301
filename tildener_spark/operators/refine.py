"""Post-tagging refinements L N S R_θ C T_θ A — document-local, order-exact.

Re-expresses NERefinements::CombinedRefsOnFile (NERefinements.pm:23-102):
the reference loads each token file once and applies the refinement
letters in the order given by the definition string (default
``"L N S R_0.7 C T_0.90"`` at NERefinements.pm:40; shipped RUN scripts
append ``A``).  ``A`` is terminal — any letters after it are ignored
(NERefinements.pm:87-96).

These heuristics mutate the token array with position- and
order-dependent writes, so they run as ONE pandas UDF over the nested
per-document token array (SURVEY.md §4.3.1: one document never spans
partitions; the whole refinement chain is shuffle-free and costs a
single Arrow round-trip per batch of documents).

Letter semantics (each implemented from the cited Perl):
  L  CleanBracketsAndQuotations   NERefinements.pm:638-942
  N  RemoveCorruptedNEs           NERefinements.pm:1021-1087
  S  corrupt-token strip (://)    NERefinements.pm:951-1012
  R  RemoveLowProbNETags          NERefinements.pm:508-522
  C  ConsolidateEqualEntities     NERefinements.pm:364-499
  T  TagEqualLemmas               NERefinements.pm:531-629
  A  AddMissingLineBreaks         NEUtilities.pm:136-260

Determinism note (SURVEY.md §4.3.4): the reference iterates Perl
hashes in arbitrary order at NERefinements.pm:425,444; we impose
documented tie-breaks — C winners by (count, sum prob, type name), T
keys longest-first then lexicographic (the longest-first part is the
reference's own sort at NERefinements.pm:582).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from tildener_spark.config import EngineConfig, GAZETTEER_TYPES
from tildener_spark.operators.tokenize import TAGGED_TYPE

_OPEN = "([{"
_CLOSE = ")]}"
_PAIR = {"(": ")", "[": "]", "{": "}"}
_QUOTES = "\"«»„“”"


# --------------------------------------------------------------- helpers

def _spans(tokens: list[dict]) -> list[tuple[int, int, str]]:
    """(start_idx, end_idx, ne_type) for each B-X (I-X)* run."""
    spans = []
    i, n = 0, len(tokens)
    while i < n:
        tag = tokens[i]["ne_tag"]
        if tag.startswith("B-"):
            t = tag[2:]
            j = i
            while j + 1 < n and tokens[j + 1]["ne_tag"] == f"I-{t}":
                j += 1
            spans.append((i, j, t))
            i = j + 1
        else:
            i += 1
    return spans


def _avg_prob(tokens: list[dict], i: int, j: int) -> float:
    """CalculateProbibility, NERefinements.pm:130-152 (0 for empty)."""
    if j < i:
        return 0.0
    return sum(tokens[k]["ne_prob"] for k in range(i, j + 1)) / (j - i + 1)


def _clear(tokens: list[dict], i: int, j: int) -> None:
    for k in range(i, j + 1):
        tokens[k]["ne_tag"] = "O"


def _retag(tokens: list[dict], i: int, j: int, ne_type: str,
           prob: float | None = None) -> None:
    for k in range(i, j + 1):
        tokens[k]["ne_tag"] = ("B-" if k == i else "I-") + ne_type
        if prob is not None:
            tokens[k]["ne_prob"] = prob


# ------------------------------------------------------------ letter: L

def _unbalance(text: str) -> tuple[int, list[str]]:
    """Count unbalanced brackets/quotes; return (count, offender chars).

    Bracket/quote character sets per NERefinements.pm:654-662; each
    unmatched opener/closer counts 1, quote marks count by parity
    (:726-734 drop rule counts total unbalanced >= 2).
    """
    offenders: list[str] = []
    for o in _OPEN:
        c = _PAIR[o]
        diff = text.count(o) - text.count(c)
        if diff > 0:
            offenders += [o] * diff
        elif diff < 0:
            offenders += [c] * (-diff)
    q = sum(text.count(ch) for ch in _QUOTES)
    if q % 2 == 1:
        offenders.append('"')
    return len(offenders), offenders


def refine_L(tokens: list[dict], cfg: EngineConfig) -> None:
    """CleanBracketsAndQuotations (NERefinements.pm:638-942).

    0 unbalanced -> keep; >=2 -> drop span (:726-734); exactly 1 ->
    trim the offending edge token, or extend the span <=3 neighbors
    ($leftEgeLength=3, :645) to the matching bracket/quote
    (:757-791,811-843,884-933).
    """
    n = len(tokens)
    for (i, j, t) in _spans(tokens):
        text = " ".join(tokens[k]["token"] for k in range(i, j + 1))
        cnt, offenders = _unbalance(text)
        if cnt == 0:
            continue
        if cnt >= 2:
            _clear(tokens, i, j)
            continue
        off = offenders[0]
        first, last = tokens[i]["token"], tokens[j]["token"]
        if off in first and first in (_OPEN + _CLOSE + _QUOTES):
            # bare bracket/quote token at left edge -> trim it
            tokens[i]["ne_tag"] = "O"
            if j > i:
                tokens[i + 1]["ne_tag"] = f"B-{t}"
            continue
        if off in last and last in (_OPEN + _CLOSE + _QUOTES):
            tokens[j]["ne_tag"] = "O"
            continue
        # search <=3 tokens outside the span for the matching char
        if off in _OPEN or (off in _QUOTES or off == '"'):
            want = _PAIR.get(off, None)
            rng = range(j + 1, min(n, j + 4))
        else:
            want = {v: k for k, v in _PAIR.items()}.get(off)
            rng = range(i - 1, max(-1, i - 4), -1)
        hit = None
        for k in rng:
            tk = tokens[k]["token"]
            if (want and want in tk) or (not want and any(q in tk for q in _QUOTES + '"')):
                hit = k
                break
        if hit is None:
            # unmatched and not recoverable: trim the offending edge
            side = i if off in tokens[i]["token"] else j
            tokens[side]["ne_tag"] = "O"
            if side == i and j > i:
                tokens[i + 1]["ne_tag"] = f"B-{t}"
            continue
        lo, hi = min(i, hit), max(j, hit)
        prob = _avg_prob(tokens, i, j)
        _retag(tokens, lo, hi, t, prob)


# ------------------------------------------------------------ letter: N

def refine_N(tokens: list[dict], cfg: EngineConfig) -> None:
    """RemoveCorruptedNEs: PERS/ORG span whose surface has >=2 '/'
    is dropped entirely (patterns at NERefinements.pm:1028-1031)."""
    for (i, j, t) in _spans(tokens):
        if t in ("PERS", "ORG"):
            text = " ".join(tokens[k]["token"] for k in range(i, j + 1))
            if text.count("/") >= 2:
                _clear(tokens, i, j)


# ------------------------------------------------------------ letter: S

def refine_S(tokens: list[dict], cfg: EngineConfig) -> None:
    """Corrupt-token strip: token matching '://' removed from the span
    edge; interior match drops the whole span (NERefinements.pm:951-1012,
    pattern at :957)."""
    for (i, j, t) in _spans(tokens):
        ks = [k for k in range(i, j + 1) if "://" in tokens[k]["token"]]
        if not ks:
            continue
        if any(i < k < j for k in ks):
            _clear(tokens, i, j)
            continue
        lo, hi = i, j
        if i in ks:
            tokens[i]["ne_tag"] = "O"
            lo = i + 1
        if j in ks and j >= lo:
            tokens[j]["ne_tag"] = "O"
            hi = j - 1
        if hi >= lo:
            _retag(tokens, lo, hi, t)
        # single-token span that was the URL itself: already cleared


# ------------------------------------------------------------ letter: R

def refine_R(tokens: list[dict], cfg: EngineConfig,
             threshold: float = 0.7) -> None:
    """RemoveLowProbNETags: null spans with avg prob < θ
    (NERefinements.pm:508-522 + gate at :269-277)."""
    for (i, j, _t) in _spans(tokens):
        if _avg_prob(tokens, i, j) < threshold:
            _clear(tokens, i, j)


# ------------------------------------------------------------ letter: C

def refine_C(tokens: list[dict], cfg: EngineConfig) -> None:
    """ConsolidateEqualEntities (NERefinements.pm:364-499).

    Per document: spans sharing the same lemma sequence but tagged
    with different NE types are re-tagged to the winning type; winner
    by (occurrence count, sum of span probs), exact ties left alone
    (:470-475). Stats per (lemmas, type): count/min/max/sum
    (:380-421)."""
    spans = _spans(tokens)
    stats: dict[str, dict[str, list[float]]] = {}
    for (i, j, t) in spans:
        key = " ".join(tokens[k]["lemma"] for k in range(i, j + 1))
        stats.setdefault(key, {}).setdefault(t, []).append(
            _avg_prob(tokens, i, j))
    for (i, j, t) in spans:
        key = " ".join(tokens[k]["lemma"] for k in range(i, j + 1))
        by_type = stats[key]
        if len(by_type) < 2:
            continue
        ranked = sorted(
            by_type.items(),
            key=lambda kv: (-len(kv[1]), -sum(kv[1]), kv[0]),
        )
        (t1, s1), (t2, s2) = ranked[0], ranked[1]
        if len(s1) == len(s2) and sum(s1) == sum(s2):
            continue  # exact tie neutralized
        if t != t1:
            _retag(tokens, i, j, t1)


# ------------------------------------------------------------ letter: T

def refine_T(tokens: list[dict], cfg: EngineConfig,
             threshold: float = 0.90) -> None:
    """TagEqualLemmas (NERefinements.pm:531-629).

    Dictionary from tagged spans: lemma sequence -> (type, avg prob);
    keys with conflicting types are poisoned (TagMismatch sentinel,
    :564); a key applies only if its avg prob >= θ (:587); untagged
    token runs matching a key (lemma equality) are tagged, longest
    keys first (:582)."""
    spans = _spans(tokens)
    lemma_dict: dict[tuple[str, ...], tuple[str | None, float, int]] = {}
    for (i, j, t) in spans:
        key = tuple(tokens[k]["lemma"] for k in range(i, j + 1))
        p = _avg_prob(tokens, i, j)
        if key in lemma_dict:
            t0, p0, c0 = lemma_dict[key]
            if t0 != t:
                lemma_dict[key] = (None, 0.0, 0)  # TagMismatch
            elif t0 is not None:
                lemma_dict[key] = (t0, p0 + p, c0 + 1)
        else:
            lemma_dict[key] = (t, p, 1)
    keys = [
        (key, t, psum / cnt)
        for key, (t, psum, cnt) in lemma_dict.items()
        if t is not None and cnt > 0 and psum / cnt >= threshold
    ]
    keys.sort(key=lambda e: (-len(e[0]), e[0]))
    n = len(tokens)
    lemmas = [tok["lemma"] for tok in tokens]
    for key, t, p in keys:
        m = len(key)
        i = 0
        while i + m <= n:
            if (
                tuple(lemmas[i:i + m]) == key
                and all(tokens[k]["ne_tag"] == "O" for k in range(i, i + m))
            ):
                _retag(tokens, i, i + m - 1, t, p)
                i += m
            else:
                i += 1


# ------------------------------------------------------------ letter: A

def refine_A(tokens: list[dict], cfg: EngineConfig) -> None:
    """AddMissingLineBreaks (NEUtilities.pm:136-260).

    We keep original line numbers through tokenization, so the
    "re-insert blank lines" bookkeeping reduces to: a span whose
    consecutive tokens jump a line gap that a blank run SURVIVING
    RemoveEmptyLines would occupy crosses a paragraph break.  Which
    runs survive depends on cfg.empty_line_mode (NEPreprocess.pm:
    23-72): mode 1 keeps every blank line (gap > 1 = break), mode 2
    keeps only runs >= 2 blanks (gap > 2 = break — a single blank
    line was removed upstream and is invisible to A), any other mode
    removes all blanks (no break ever).  prob > 0.8 => relabel the
    continuation I- -> B- (split); else continuation -> O (threshold
    at NEUtilities.pm:202)."""
    if cfg.empty_line_mode not in (1, 2):
        return
    min_gap = 1 if cfg.empty_line_mode == 1 else 2
    for (i, j, t) in _spans(tokens):
        prob = _avg_prob(tokens, i, j)
        for k in range(i + 1, j + 1):
            if tokens[k]["line_from"] - tokens[k - 1]["line_to"] > min_gap:
                if prob > cfg.paragraph_break_prob:
                    tokens[k]["ne_tag"] = f"B-{t}"
                else:
                    _clear(tokens, k, j)
                break


_LETTERS = {
    "L": refine_L, "N": refine_N, "S": refine_S,
    "C": refine_C, "A": refine_A,
}


def refine_doc_py(tokens: list[dict], cfg: EngineConfig) -> list[dict]:
    """Apply the configured refinement chain to one document, in order.

    Mirrors the dispatch loop of CombinedRefsOnFile
    (NERefinements.pm:58-101): unknown letters skipped, A terminal."""
    tokens = [dict(t) for t in tokens]
    for letter, thr in cfg.refinement_steps():
        if letter == "R":
            refine_R(tokens, cfg, 0.7 if thr is None else thr)
        elif letter == "T":
            refine_T(tokens, cfg, 0.90 if thr is None else thr)
        elif letter in _LETTERS:
            _LETTERS[letter](tokens, cfg)
            if letter == "A":
                break  # A is terminal (NERefinements.pm:87-96)
    return tokens


def make_refine_udf(cfg: EngineConfig | None = None):
    cfg = cfg or EngineConfig()

    @F.pandas_udf(TAGGED_TYPE)
    def refine_document(tokens: pd.Series) -> pd.Series:
        return tokens.map(lambda ts: refine_doc_py(list(ts), cfg))

    return refine_document


def with_refinements(df: DataFrame, cfg: EngineConfig | None = None,
                     tokens_col: str = "tokens",
                     out_col: str = "tokens") -> DataFrame:
    return df.withColumn(out_col, make_refine_udf(cfg)(F.col(tokens_col)))


# ------------------------------------------------- DataFrame-only variants
# (oracle-checkable forms of the SQL-expressible letters, SURVEY.md §7.6)

def refine_R_df(mentions: DataFrame, threshold: float = 0.7) -> DataFrame:
    """R as a pure filter over the mentions table."""
    return mentions.filter(F.col("avg_prob") >= threshold)


def refine_N_df(mentions: DataFrame) -> DataFrame:
    """N as a pure filter: drop PERS/ORG surfaces with >=2 slashes."""
    slashes = F.size(F.split(F.col("surface"), "/")) - 1
    return mentions.filter(
        ~(F.col("ne_type").isin("PERS", "ORG") & (slashes >= 2))
    )
