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

The implementations operate on parallel arrays (tags, probs, tokens,
lemmas, line spans) — the representation the fused hot path
(operators/document.py, TokenTable) already holds — so the refinement
chain allocates no per-token objects (VERDICT r02 next-round item 4).
The dict-based ``refine_X(tokens, cfg)`` functions remain the public
API for the modular path and tests; they are thin in-place wrappers
over the same cores.

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

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from tildener_spark.config import EngineConfig, GAZETTEER_TYPES
from tildener_spark.operators.tokenize import TAGGED_TYPE, TokenTable

_OPEN = "([{"
_CLOSE = ")]}"
_PAIR = {"(": ")", "[": "]", "{": "}"}
_QUOTES = "\"«»„“”"
_BRACKETY = re.compile("[%s]" % re.escape(_OPEN + _CLOSE + _QUOTES))


# --------------------------------------------------------------- helpers

def _spans(tags: list[str]) -> list[tuple[int, int, str]]:
    """(start_idx, end_idx, ne_type) for each B-X (I-X)* run.

    Single enumerate pass (no per-position slicing/indexing): a run
    opens on B-X, extends on exact I-X, closes on anything else.
    Orphan I tags (no open matching run) are not spans — identical to
    the two-level scan this replaced.  Label space is closed
    (BIO_LABELS), so first-char dispatch is exact here."""
    spans = []
    append = spans.append
    start = -1
    cur_t = want = ""
    for i, tag in enumerate(tags):
        if tag[0] == "B":
            if start >= 0:
                append((start, i - 1, cur_t))
            cur_t = tag[2:]
            want = "I" + tag[1:]
            start = i
        elif start >= 0 and tag != want:
            append((start, i - 1, cur_t))
            start = -1
    if start >= 0:
        append((start, len(tags) - 1, cur_t))
    return spans


def _avg_prob(probs: list[float], i: int, j: int) -> float:
    """CalculateProbibility, NERefinements.pm:130-152 (0 for empty)."""
    if j < i:
        return 0.0
    seg = probs[i:j + 1]
    return sum(seg) / len(seg)


def _clear(tags: list[str], i: int, j: int) -> None:
    tags[i:j + 1] = ["O"] * (j - i + 1)


def _retag(tags: list[str], i: int, j: int, ne_type: str,
           probs: list[float] | None = None,
           prob: float | None = None) -> None:
    tags[i] = "B-" + ne_type
    tags[i + 1:j + 1] = ["I-" + ne_type] * (j - i)
    if prob is not None:
        probs[i:j + 1] = [prob] * (j - i + 1)


# ------------------------------------------------------------ letter: L

def _unbalance(text: str) -> tuple[int, list[str]]:
    """Count unbalanced brackets/quotes; return (count, offender chars).

    Bracket/quote character sets per NERefinements.pm:654-662; each
    unmatched opener/closer counts 1, quote marks count by parity
    (:726-734 drop rule counts total unbalanced >= 2).
    """
    if _BRACKETY.search(text) is None:
        # fast path: most span surfaces carry no bracket/quote chars
        # at all — one C-level scan instead of 15 .count() passes
        return 0, []
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


def _core_L(tags: list[str], probs: list[float],
            toks: list[str], spans=None) -> bool:
    """CleanBracketsAndQuotations (NERefinements.pm:638-942).

    0 unbalanced -> keep; >=2 -> drop span (:726-734); exactly 1 ->
    trim the offending edge token, or extend the span <=3 neighbors
    ($leftEgeLength=3, :645) to the matching bracket/quote
    (:757-791,811-843,884-933).

    ``spans``: optional precomputed ``_spans(tags)`` (the chain's
    dirty-flag cache); every core returns True iff it wrote tags.
    """
    changed = False
    n = len(tags)
    for (i, j, t) in (_spans(tags) if spans is None else spans):
        text = " ".join(toks[i:j + 1])
        cnt, offenders = _unbalance(text)
        if cnt == 0:
            continue
        if cnt >= 2:
            _clear(tags, i, j)
            changed = True
            continue
        off = offenders[0]
        first, last = toks[i], toks[j]
        if off in first and first in (_OPEN + _CLOSE + _QUOTES):
            # bare bracket/quote token at left edge -> trim it
            tags[i] = "O"
            if j > i:
                tags[i + 1] = f"B-{t}"
            changed = True
            continue
        if off in last and last in (_OPEN + _CLOSE + _QUOTES):
            tags[j] = "O"
            changed = True
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
            tk = toks[k]
            if (want and want in tk) or (not want and any(q in tk for q in _QUOTES + '"')):
                hit = k
                break
        if hit is None:
            # unmatched and not recoverable: trim the offending edge
            side = i if off in toks[i] else j
            tags[side] = "O"
            if side == i and j > i:
                tags[i + 1] = f"B-{t}"
            changed = True
            continue
        lo, hi = min(i, hit), max(j, hit)
        prob = _avg_prob(probs, i, j)
        _retag(tags, lo, hi, t, probs, prob)
        changed = True
    return changed


# ------------------------------------------------------------ letter: N

def _core_N(tags: list[str], toks: list[str], spans=None) -> bool:
    """RemoveCorruptedNEs: PERS/ORG span whose surface has >=2 '/'
    is dropped entirely (patterns at NERefinements.pm:1028-1031)."""
    changed = False
    for (i, j, t) in (_spans(tags) if spans is None else spans):
        if t in ("PERS", "ORG"):
            if sum(toks[k].count("/") for k in range(i, j + 1)) >= 2:
                _clear(tags, i, j)
                changed = True
    return changed


# ------------------------------------------------------------ letter: S

def _core_S(tags: list[str], toks: list[str], spans=None) -> bool:
    """Corrupt-token strip: token matching '://' removed from the span
    edge; interior match drops the whole span (NERefinements.pm:951-1012,
    pattern at :957)."""
    changed = False
    for (i, j, t) in (_spans(tags) if spans is None else spans):
        ks = [k for k in range(i, j + 1) if "://" in toks[k]]
        if not ks:
            continue
        changed = True  # edge trim and/or clear follows unconditionally
        if any(i < k < j for k in ks):
            _clear(tags, i, j)
            continue
        lo, hi = i, j
        if i in ks:
            tags[i] = "O"
            lo = i + 1
        if j in ks and j >= lo:
            tags[j] = "O"
            hi = j - 1
        if hi >= lo:
            _retag(tags, lo, hi, t)
        # single-token span that was the URL itself: already cleared
    return changed


# ------------------------------------------------------------ letter: R

def _core_R(tags: list[str], probs: list[float],
            threshold: float = 0.7, spans=None) -> bool:
    """RemoveLowProbNETags: null spans with avg prob < θ
    (NERefinements.pm:508-522 + gate at :269-277)."""
    changed = False
    for (i, j, _t) in (_spans(tags) if spans is None else spans):
        if _avg_prob(probs, i, j) < threshold:
            _clear(tags, i, j)
            changed = True
    return changed


# ------------------------------------------------------------ letter: C

def _core_C(tags: list[str], probs: list[float],
            lemmas: list[str], spans=None) -> bool:
    """ConsolidateEqualEntities (NERefinements.pm:364-499).

    Per document: spans sharing the same lemma sequence but tagged
    with different NE types are re-tagged to the winning type; winner
    by (occurrence count, sum of span probs), exact ties left alone
    (:470-475). Stats per (lemmas, type): count/min/max/sum
    (:380-421)."""
    changed = False
    if spans is None:
        spans = _spans(tags)
    keys = [" ".join(lemmas[i:j + 1]) for (i, j, _t) in spans]
    stats: dict[str, dict[str, list[float]]] = {}
    for key, (i, j, t) in zip(keys, spans):
        stats.setdefault(key, {}).setdefault(t, []).append(
            _avg_prob(probs, i, j))
    for key, (i, j, t) in zip(keys, spans):
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
            _retag(tags, i, j, t1)
            changed = True
    return changed


# ------------------------------------------------------------ letter: T

def _core_T(tags: list[str], probs: list[float], lemmas: list[str],
            threshold: float = 0.90, spans=None) -> bool:
    """TagEqualLemmas (NERefinements.pm:531-629).

    Dictionary from tagged spans: lemma sequence -> (type, avg prob);
    keys with conflicting types are poisoned (TagMismatch sentinel,
    :564); a key applies only if its avg prob >= θ (:587); untagged
    token runs matching a key (lemma equality) are tagged, longest
    keys first (:582).

    The application scan is indexed by first lemma: a key of length m
    can only match at positions whose lemma equals key[0], so only
    those candidates are probed (same result as the full left-to-right
    scan with its skip-m-on-match rule, at a fraction of the probes).
    """
    changed = False
    if spans is None:
        spans = _spans(tags)
    lemma_dict: dict[tuple[str, ...], tuple[str | None, float, int]] = {}
    for (i, j, t) in spans:
        key = tuple(lemmas[i:j + 1])
        p = _avg_prob(probs, i, j)
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
    if not keys:
        return changed
    keys.sort(key=lambda e: (-len(e[0]), e[0]))
    n = len(tags)
    by_first: dict[str, list[int]] = {}
    for idx, lemma in enumerate(lemmas):
        by_first.setdefault(lemma, []).append(idx)
    for key, t, p in keys:
        m = len(key)
        klist = list(key)
        untag = ["O"] * m
        next_free = 0  # left-to-right scan with skip-m-on-match
        for i in by_first.get(klist[0], ()):
            if i < next_free or i + m > n:
                continue
            if lemmas[i:i + m] == klist and tags[i:i + m] == untag:
                _retag(tags, i, i + m - 1, t, probs, p)
                changed = True
                next_free = i + m
    return changed


# ------------------------------------------------------------ letter: A

def _core_A(tags: list[str], probs: list[float], line_from: list[int],
            line_to: list[int], cfg: EngineConfig,
            spans=None) -> bool:
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
    changed = False
    if cfg.empty_line_mode not in (1, 2):
        return changed
    min_gap = 1 if cfg.empty_line_mode == 1 else 2
    for (i, j, t) in (_spans(tags) if spans is None else spans):
        prob = _avg_prob(probs, i, j)
        for k in range(i + 1, j + 1):
            if line_from[k] - line_to[k - 1] > min_gap:
                if prob > cfg.paragraph_break_prob:
                    tags[k] = f"B-{t}"
                else:
                    _clear(tags, k, j)
                changed = True
                break
    return changed


# ------------------------------------------------- chain over arrays

def _run_chain(tags: list[str], probs: list[float], toks: list[str],
               lemmas: list[str], line_from: list[int],
               line_to: list[int], cfg: EngineConfig) -> None:
    """Dispatch loop of CombinedRefsOnFile (NERefinements.pm:58-101):
    unknown letters skipped, A terminal.

    The BIO span list is rebuilt only after a step that actually
    wrote tags (each core returns that): on typical documents most
    steps fire nothing, so the 7-step chain does 1-2 span scans
    instead of 7.  Semantics unchanged — a cached list is exactly
    what the core would recompute, and ANY tag write (including
    type-only rewrites in C) invalidates."""
    spans = None
    for letter, thr in cfg.refinement_steps():
        if spans is None:
            spans = _spans(tags)
        if letter == "R":
            changed = _core_R(tags, probs, 0.7 if thr is None else thr,
                              spans=spans)
        elif letter == "T":
            changed = _core_T(tags, probs, lemmas,
                              0.90 if thr is None else thr, spans=spans)
        elif letter == "L":
            changed = _core_L(tags, probs, toks, spans=spans)
        elif letter == "N":
            changed = _core_N(tags, toks, spans=spans)
        elif letter == "S":
            changed = _core_S(tags, toks, spans=spans)
        elif letter == "C":
            changed = _core_C(tags, probs, lemmas, spans=spans)
        elif letter == "A":
            _core_A(tags, probs, line_from, line_to, cfg, spans=spans)
            break  # A is terminal (NERefinements.pm:87-96)
        else:
            continue  # unknown letter: nothing ran, cache stays valid
        if changed:
            spans = None


def refine_table(tt: TokenTable, cfg: EngineConfig) -> None:
    """Columnar form: refine a classified TokenTable in place."""
    _run_chain(tt.ne_tag, tt.ne_prob, tt.token, tt.lemma,
               tt.line_from, tt.line_to, cfg)


# ---------------------------------------- dict wrappers (modular path)

def _arrays(tokens: list[dict]) -> tuple[list[str], list[float]]:
    return ([t["ne_tag"] for t in tokens],
            [t["ne_prob"] for t in tokens])


def _writeback(tokens: list[dict], tags: list[str],
               probs: list[float]) -> None:
    for t, tag, p in zip(tokens, tags, probs):
        t["ne_tag"] = tag
        t["ne_prob"] = p


def refine_L(tokens: list[dict], cfg: EngineConfig) -> None:
    tags, probs = _arrays(tokens)
    _core_L(tags, probs, [t["token"] for t in tokens])
    _writeback(tokens, tags, probs)


def refine_N(tokens: list[dict], cfg: EngineConfig) -> None:
    tags, probs = _arrays(tokens)
    _core_N(tags, [t["token"] for t in tokens])
    _writeback(tokens, tags, probs)


def refine_S(tokens: list[dict], cfg: EngineConfig) -> None:
    tags, probs = _arrays(tokens)
    _core_S(tags, [t["token"] for t in tokens])
    _writeback(tokens, tags, probs)


def refine_R(tokens: list[dict], cfg: EngineConfig,
             threshold: float = 0.7) -> None:
    tags, probs = _arrays(tokens)
    _core_R(tags, probs, threshold)
    _writeback(tokens, tags, probs)


def refine_C(tokens: list[dict], cfg: EngineConfig) -> None:
    tags, probs = _arrays(tokens)
    _core_C(tags, probs, [t["lemma"] for t in tokens])
    _writeback(tokens, tags, probs)


def refine_T(tokens: list[dict], cfg: EngineConfig,
             threshold: float = 0.90) -> None:
    tags, probs = _arrays(tokens)
    _core_T(tags, probs, [t["lemma"] for t in tokens], threshold)
    _writeback(tokens, tags, probs)


def refine_A(tokens: list[dict], cfg: EngineConfig) -> None:
    tags, probs = _arrays(tokens)
    _core_A(tags, probs, [t["line_from"] for t in tokens],
            [t["line_to"] for t in tokens], cfg)
    _writeback(tokens, tags, probs)


def refine_doc_py(tokens: list[dict], cfg: EngineConfig) -> list[dict]:
    """Apply the configured refinement chain to one document, in order.

    Mirrors the dispatch loop of CombinedRefsOnFile
    (NERefinements.pm:58-101): unknown letters skipped, A terminal.
    Returns fresh dicts; the input is not mutated."""
    tags, probs = _arrays(tokens)
    _run_chain(tags, probs,
               [t["token"] for t in tokens],
               [t["lemma"] for t in tokens],
               [t["line_from"] for t in tokens],
               [t["line_to"] for t in tokens], cfg)
    return [
        {**tok, "ne_tag": tag, "ne_prob": p}
        for tok, tag, p in zip(tokens, tags, probs)
    ]


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
