"""Per-letter differential tests for the refinement chain
(NERefinements.pm / NEUtilities.pm semantics, SURVEY.md §2.2/§2.5)."""

from tildener_spark.config import EngineConfig
from tildener_spark.operators.refine import (
    refine_A, refine_C, refine_L, refine_N, refine_R, refine_S,
    refine_T, refine_doc_py,
)

CFG = EngineConfig()


def mk(toks):
    """[(token, tag, prob)] -> token dicts (lemma = lower, one line)."""
    out = []
    col = 0
    for i, (tok, tag, prob) in enumerate(toks):
        out.append({
            "tok_id": i, "sent_id": 0, "token": tok, "pos": "NN",
            "lemma": tok.lower(), "morpho": "x", "line_from": 0,
            "col_from": col, "line_to": 0, "col_to": col + len(tok) - 1,
            "ne_tag": tag, "ne_prob": prob,
        })
        col += len(tok) + 1
    return out


def tags(toks):
    return [t["ne_tag"] for t in toks]


# ------------------------------------------------------------------- R

def test_R_drops_low_prob_spans():
    t = mk([("Zibens", "B-PERS", 0.55), ("un", "O", 0.97),
            ("Jānis", "B-PERS", 0.97), ("Bērziņš", "I-PERS", 0.97)])
    refine_R(t, CFG, 0.7)
    assert tags(t) == ["O", "O", "B-PERS", "I-PERS"]


def test_R_uses_span_average():
    t = mk([("A", "B-ORG", 0.6), ("B", "I-ORG", 0.9)])  # avg 0.75
    refine_R(t, CFG, 0.7)
    assert tags(t) == ["B-ORG", "I-ORG"]


# ------------------------------------------------------------------- N

def test_N_drops_slash_heavy_pers_org():
    t = mk([("a/b/c", "B-ORG", 0.9), ("x", "I-ORG", 0.9)])
    refine_N(t, CFG)
    assert tags(t) == ["O", "O"]


def test_N_keeps_loc_and_single_slash():
    t = mk([("a/b/c", "B-LOC", 0.9), ("a/b", "B-ORG", 0.9)])
    refine_N(t, CFG)
    assert tags(t) == ["B-LOC", "B-ORG"]


# ------------------------------------------------------------------- S

def test_S_strips_url_at_edge():
    t = mk([("http://x.lv", "B-ORG", 0.9), ("Banka", "I-ORG", 0.9)])
    refine_S(t, CFG)
    assert tags(t) == ["O", "B-ORG"]


def test_S_drops_span_with_interior_url():
    t = mk([("A", "B-ORG", 0.9), ("http://x.lv", "I-ORG", 0.9),
            ("B", "I-ORG", 0.9)])
    refine_S(t, CFG)
    assert tags(t) == ["O", "O", "O"]


# ------------------------------------------------------------------- L

def test_L_drops_two_unbalanced():
    t = mk([("((A", "B-ORG", 0.9), ("B{", "I-ORG", 0.9)])
    refine_L(t, CFG)
    assert tags(t) == ["O", "O"]


def test_L_trims_bare_edge_bracket():
    t = mk([("(", "B-ORG", 0.9), ("Banka", "I-ORG", 0.9)])
    refine_L(t, CFG)
    assert tags(t) == ["O", "B-ORG"]


def test_L_extends_to_matching_bracket():
    t = mk([("(Banka", "B-ORG", 0.9), ("grupa)", "O", 0.97)])
    refine_L(t, CFG)
    assert tags(t) == ["B-ORG", "I-ORG"]


def test_L_balanced_untouched():
    t = mk([("(Banka)", "B-ORG", 0.9)])
    refine_L(t, CFG)
    assert tags(t) == ["B-ORG"]


# ------------------------------------------------------------------- C

def test_C_consolidates_to_majority_type():
    t = mk([("Rīga", "B-LOC", 0.9), ("x", "O", 0.97),
            ("Rīga", "B-LOC", 0.9), ("y", "O", 0.97),
            ("Rīga", "B-ORG", 0.9)])
    refine_C(t, CFG)
    assert tags(t) == ["B-LOC", "O", "B-LOC", "O", "B-LOC"]


def test_C_exact_tie_left_alone():
    t = mk([("Rīga", "B-LOC", 0.9), ("x", "O", 0.97),
            ("Rīga", "B-ORG", 0.9)])
    refine_C(t, CFG)
    assert tags(t) == ["B-LOC", "O", "B-ORG"]


# ------------------------------------------------------------------- T

def test_T_propagates_high_prob_lemma():
    t = mk([("Skrastiņš", "B-PERS", 0.92), (".", "O", 0.97),
            ("skrastiņš", "O", 0.97)])
    refine_T(t, CFG, 0.90)
    assert tags(t) == ["B-PERS", "O", "B-PERS"]
    assert t[2]["ne_prob"] == 0.92


def test_T_threshold_blocks_low_prob_keys():
    t = mk([("Zibens", "B-PERS", 0.55), (".", "O", 0.97),
            ("zibens", "O", 0.97)])
    refine_T(t, CFG, 0.90)
    assert tags(t) == ["B-PERS", "O", "O"]


def test_T_type_conflict_poisons_key():
    t = mk([("Rīga", "B-LOC", 0.95), ("x", "O", 0.97),
            ("Rīga", "B-ORG", 0.95), ("y", "O", 0.97),
            ("rīga", "O", 0.97)])
    refine_T(t, CFG, 0.90)
    assert t[4]["ne_tag"] == "O"


def test_T_longest_key_first():
    t = mk([("Jānis", "B-PERS", 0.95), ("Bērziņš", "I-PERS", 0.95),
            ("un", "O", 0.97), ("Bērziņš", "B-PERS", 0.95),
            ("atkal", "O", 0.97),
            ("jānis", "O", 0.97), ("bērziņš", "O", 0.97)])
    refine_T(t, CFG, 0.90)
    # two-token key applies before single-token key
    assert tags(t)[5:] == ["B-PERS", "I-PERS"]


# ------------------------------------------------------------------- A

def test_A_splits_high_prob_span_at_paragraph():
    t = mk([("Jānis", "B-PERS", 0.95), ("Bērziņš", "I-PERS", 0.95)])
    t[1]["line_from"] = t[1]["line_to"] = 2  # paragraph gap
    refine_A(t, CFG)
    assert tags(t) == ["B-PERS", "B-PERS"]


def test_A_drops_low_prob_continuation():
    t = mk([("Jānis", "B-PERS", 0.6), ("Bērziņš", "I-PERS", 0.6)])
    t[1]["line_from"] = t[1]["line_to"] = 2
    refine_A(t, CFG)
    assert tags(t) == ["B-PERS", "O"]


# --------------------------------------------------------------- chain

def test_chain_order_R_before_T_recovers_oov():
    # shape-tagged bare occurrence is first removed by R, then T
    # re-tags it from the high-prob honorific occurrence
    t = mk([("Skrastiņš", "B-PERS", 0.92), (".", "O", 0.97),
            ("Skrastiņš", "B-PERS", 0.55), (".", "O", 0.97)])
    out = refine_doc_py(t, EngineConfig(refinements="L N S R_0.7 C T_0.90 A"))
    assert tags(out) == ["B-PERS", "O", "B-PERS", "O"]
    assert out[2]["ne_prob"] == 0.92


def test_A_is_terminal():
    cfg = EngineConfig(refinements="A R_0.99")
    t = mk([("Jānis", "B-PERS", 0.95)])
    out = refine_doc_py(t, cfg)
    assert tags(out) == ["B-PERS"]  # R_0.99 after A must not run


def test_unknown_letters_skipped():
    cfg = EngineConfig(refinements="Q Z R_0.7")
    t = mk([("Zibens", "B-PERS", 0.55)])
    assert tags(refine_doc_py(t, cfg)) == ["O"]


def test_A_gap_rule_follows_empty_line_mode():
    # mode 2: a SINGLE blank line was removed upstream, so a gap of
    # exactly one line is invisible to A; a 2-blank paragraph gap
    # still splits (NEPreprocess.pm:23-72 x NEUtilities.pm:136-260)
    cfg2 = EngineConfig(empty_line_mode=2)
    t = mk([("Jānis", "B-PERS", 0.95), ("Bērziņš", "I-PERS", 0.95)])
    t[1]["line_from"] = t[1]["line_to"] = 2  # one blank line between
    refine_A(t, cfg2)
    assert tags(t) == ["B-PERS", "I-PERS"]  # survives under mode 2
    t[1]["line_from"] = t[1]["line_to"] = 3  # two blank lines
    refine_A(t, cfg2)
    assert tags(t) == ["B-PERS", "B-PERS"]
    # mode 0: no blank lines survive anywhere -> A never splits
    t = mk([("Jānis", "B-PERS", 0.95), ("Bērziņš", "I-PERS", 0.95)])
    t[1]["line_from"] = t[1]["line_to"] = 9
    refine_A(t, EngineConfig(empty_line_mode=0))
    assert tags(t) == ["B-PERS", "I-PERS"]
