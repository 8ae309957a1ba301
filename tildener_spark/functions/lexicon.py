"""Deterministic POS/lemma lexicon — the stand-in for TreeTagger.

The reference delegates tokenization/POS/lemma to external pretrained
taggers (TreeTagger / Tilde tagger, Tag.pm:60-281).  Those engines are
"model data" the toolkit ships around; our deterministic equivalent is
a small closed verb lexicon plus shape rules.  Anything not covered
falls back to NN with lemma = lowercase(token), which is exactly the
degradation mode of TreeTagger's unknown-word handling.
"""

from __future__ import annotations

# Latvian-flavoured verb surface -> lemma map (3rd person past/present
# forms used by news-like text; covers the corpus templates and common
# verbs). Extending this list changes POS output — version it.
VERB_LEMMAS = {
    "vadīja": "vadīt", "vada": "vadīt",
    "dibināja": "dibināt", "dibina": "dibināt",
    "atbalstīja": "atbalstīt", "atbalsta": "atbalstīt",
    "kritizēja": "kritizēt", "kritizē": "kritizēt",
    "pārdeva": "pārdot", "pārdod": "pārdot",
    "nopirka": "nopirkt", "nopērk": "nopirkt",
    "apmeklēja": "apmeklēt", "apmeklē": "apmeklēt",
    "dzīvo": "dzīvot", "dzīvoja": "dzīvot",
    "strādā": "strādāt", "strādāja": "strādāt",
    "satika": "satikt", "satiek": "satikt",
    "atrodas": "atrasties", "atradās": "atrasties",
    "ir": "būt", "bija": "būt", "būs": "būt",
    "teica": "teikt", "saka": "teikt",
    "ieguva": "iegūt", "iegūst": "iegūt",
}

SENTENCE_END = {".", "!", "?"}
HONORIFICS = {"kungs", "kundze"}
MONTH_WORDS = {
    "janvārī", "februārī", "martā", "aprīlī", "maijā", "jūnijā",
    "jūlijā", "augustā", "septembrī", "oktobrī", "novembrī", "decembrī",
    "janvāris", "februāris", "marts", "aprīlis", "maijs", "jūnijs",
    "jūlijs", "augusts", "septembris", "oktobris", "novembris",
    "decembris", "gadā", "gads", "gada",
}
CURRENCY_WORDS = {"eur", "usd", "ls", "lvl", "eiro", "dolāru", "latu"}
