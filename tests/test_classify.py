"""Classifier decision list (operators/classify.py)."""

from tildener_spark.operators.classify import (
    P_EXACT, P_HONORIFIC, P_ORG_INIT, P_PATTERN, P_SHAPE,
    build_gazetteer_index, classify_doc_py,
)
from tildener_spark.operators.tokenize import tokenize_text_py

GAZ = build_gazetteer_index([
    ("PERS", "Jānis Bērziņš"),
    ("PERS", "Bērziņš"),
    ("LOC", "Rīga"),
    ("ORG", "Baltijas Banka"),
    ("ORG", "SIA Baltijas Banka"),
    ("ORG_INIT", "SIA"),
    ("ORG_INIT", "AS"),
])


def tag(text):
    toks = classify_doc_py(tokenize_text_py(text), GAZ)
    return [(t["token"], t["ne_tag"], t["ne_prob"]) for t in toks]


def test_longest_match_wins():
    r = tag("šodien Jānis Bērziņš brauc .")
    assert r[1] == ("Jānis", "B-PERS", P_EXACT)
    assert r[2] == ("Bērziņš", "I-PERS", P_EXACT)


def test_init_prefixed_gazetteer_entry_matched_whole():
    r = tag("šodien SIA Baltijas Banka strādā .")
    assert [x[1] for x in r[1:4]] == ["B-ORG", "I-ORG", "I-ORG"]
    assert r[1][2] == P_EXACT


def test_org_init_cue_for_oov():
    r = tag("šodien SIA Dati strādā .")
    assert r[1] == ("SIA", "B-ORG", P_ORG_INIT)
    assert r[2] == ("Dati", "I-ORG", P_ORG_INIT)


def test_honorific_cue():
    r = tag("šodien Skrastiņš kungs brauc .")
    assert r[1] == ("Skrastiņš", "B-PERS", P_HONORIFIC)
    assert r[2][1] == "O"  # the cue word itself is not in the span


def test_shape_fallback_mid_sentence_only():
    r = tag("šodien Zibens spēra .")
    assert r[1] == ("Zibens", "B-PERS", P_SHAPE)
    r2 = tag("Zibens spēra .")  # sentence-initial: no shape tag
    assert r2[0][1] == "O"


def test_allcaps_headline_not_tagged():
    r = tag("LIELAIS VIRSRAKSTS")
    assert all(x[1] == "O" for x in r)


def test_date_time_money_patterns():
    r = tag("cena 500 eiro bija 12:30 2024 gada 5 janvārī .")
    d = {t: (tag_, p) for t, tag_, p in r}
    assert d["500"] == ("B-MON", P_PATTERN)
    assert d["eiro"] == ("I-MON", P_PATTERN)
    assert d["12:30"] == ("B-TIME", P_PATTERN)
    assert d["2024"] == ("B-DATE", P_PATTERN)
    assert d["janvārī"][0] == "I-DATE"


def test_lemma_level_fallback():
    # lowercase variant matches at lemma level with lower prob
    r = tag("šodien rīga mirdz .")
    assert r[1][1] == "B-LOC"
    assert r[1][2] < P_EXACT
