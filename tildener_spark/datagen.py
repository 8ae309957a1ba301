"""Deterministic synthetic Common-Crawl-style corpus with gold labels.

The reference ships golden corpora under TEST/ (51 token-gold docs, 66
MUC-7 plaintexts — README:1-13); its models are absent from the
checkout (.MISSING_LARGE_BLOBS), so parity is measured against a
generated corpus whose ground truth is known *by construction*:
every page is composed from sentence templates over a closed world of
entities, so gold mentions, gold (subj, pred, obj) triples and gold
alias->canonical links fall out of generation.

Shape matches BASELINE.json input_hint exactly:
    pages(url string, warc_ts timestamp, html binary, text string,
          lang string)
and ``text`` is *defined* as ``extract_text_py(html)`` — generation
composes the html, then runs the same extraction the engine uses, so
the byte-identity invariant holds by construction and is separately
unit-tested against committed fixtures.

Generation is seeded per document (seed, doc_id) and runs distributed
via mapInPandas — a 10^12-row version of this table is the same code
over ``spark.range(n)`` with more partitions.

Corpus phenomena (mirroring TEST/ fixtures, FIXTURES.md §1):
  * blank-line paragraph structure (refinement A, NEUtilities.pm:136);
  * ALL-CAPS headline line (cf. TEST/gold_tab_sep_in/
    baltictimesseed-2000-02-10_*.gold:4);
  * mid-sentence capitalized noise words — false-positive bait for the
    shape-only tagger, removed by R_0.7 (NERefinements.pm:508-522);
  * out-of-gazetteer entities detectable only via context cues
    ("X kungs" honorific, "SIA X" org-initialism — LV_ORG_INIT
    gazetteer semantics) whose *second*, cue-less occurrence is only
    recoverable via refinement T (TagEqualLemmas,
    NERefinements.pm:531-629);
  * alias surface variants (last-name-only) for entity linking.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from tildener_spark.functions.text import extract_text_py

# ------------------------------------------------------------------ world

FIRST_NAMES = [
    "Jānis", "Pēteris", "Andris", "Ilze", "Līga", "Māris", "Anna",
    "Kārlis", "Edgars", "Inese", "Valdis", "Zane", "Roberts", "Dace",
    "Gunārs", "Elīna", "Oskars", "Marta", "Viktors", "Laura",
]
LAST_NAMES = [
    "Bērziņš", "Kalniņš", "Ozoliņš", "Jansons", "Liepa", "Krūmiņš",
    "Balodis", "Eglītis", "Zariņš", "Vanags", "Priede", "Sproģis",
    "Auziņš", "Dzenis", "Lācis", "Strazdiņš", "Vilks", "Celms",
    "Rozīte", "Purviņš",
]
LOCATIONS = [
    "Rīga", "Ventspils", "Daugavpils", "Liepāja", "Jelgava", "Jūrmala",
    "Valmiera", "Rēzekne", "Cēsis", "Sigulda", "Tukums", "Ogre",
    "Saldus", "Talsi", "Kuldīga", "Bauska", "Madona", "Limbaži",
    "Vecrīga", "Pārdaugava",
]
ORG_CORES = [
    "Baltijas Banka", "Latvijas Universitāte", "Rīgas Dome",
    "Ziemeļu Fonds", "Austrumu Grupa", "Dzintara Centrs",
    "Vidzemes Augstskola", "Kurzemes Radio", "Zemgales Piens",
    "Latgales Enerģija", "Daugavas Vanagi", "Brīvības Institūts",
    "Saules Parks", "Mēness Aptieka", "Jūras Līnijas",
]
ORG_INITIALISMS = ["SIA", "AS"]  # LV_ORG_INIT gazetteer semantics
# Out-of-gazetteer entity cores (detected only via context cues).
OOV_PERS = [
    "Skrastiņš", "Vītoliņš", "Grīnbergs", "Paegle", "Rubenis",
    "Caune", "Dumpis", "Āboliņš",
]
OOV_ORGS = ["Dati", "Tilts", "Avots", "Ceļi", "Grauds", "Loģistika"]
# Verb surface -> lemma (pattern predicates).
VERBS_ORG = {
    "vadīja": "vadīt", "dibināja": "dibināt", "atbalstīja": "atbalstīt",
    "kritizēja": "kritizēt", "pārdeva": "pārdot", "nopirka": "nopirkt",
}
VERBS_LOC = {"apmeklēja": "apmeklēt", "dzīvo": "dzīvot", "strādā": "strādāt"}
VERB_MEET = {"satika": "satikt"}
ALL_VERBS = {**VERBS_ORG, **VERBS_LOC, **VERB_MEET, "atrodas": "atrasties"}
FILLER = [
    "šodien", "vakar", "rīt", "tomēr", "arī", "jau", "vēl", "tikai",
    "ļoti", "daudz", "maz", "labi", "slikti", "ātri", "lēni", "kopā",
    "atkal", "tagad", "te", "tur", "pēc", "pirms", "starp", "pret",
    "gada", "mēneša", "nedēļas", "dienas", "projekta", "līguma",
    "tirgus", "naudas", "darba", "ziņas", "laika", "vietas",
]
# Mid-sentence capitalized noise (shape-FP bait; not in any gazetteer,
# never in gold). Removed by R_0.7.
NOISE_CAPS = ["Zibens", "Vējš", "Sniegs", "Lietus", "Migla", "Salna"]
URL_TOKENS = ["http://piemers.lv/ziņas", "https://dati.example.com/x"]

LANGS = ["lv", "lv", "lv", "lt", "et"]  # lv-heavy, like the toolkit


def world_gazetteer() -> list[tuple[str, str]]:
    """(ne_type, surface) rows — the broadcastable dimension table.

    Mirrors Sample_Data/LV_Gazetteer format ``TYPE\\tsurface``
    (multi-token allowed); last names included as single-token PERS
    entries like the reference gazetteer's bare first names.
    """
    rows: list[tuple[str, str]] = []
    for fn in FIRST_NAMES:
        for ln in LAST_NAMES:
            rows.append(("PERS", f"{fn} {ln}"))
    for ln in LAST_NAMES:
        rows.append(("PERS", ln))
    for loc in LOCATIONS:
        rows.append(("LOC", loc))
    for core in ORG_CORES:
        rows.append(("ORG", core))
        for init in ORG_INITIALISMS:
            rows.append(("ORG", f"{init} {core}"))
    for init in ORG_INITIALISMS:
        rows.append(("ORG_INIT", init))
    return rows


# ------------------------------------------------------------- generation


def _pers(rng: random.Random) -> str:
    return f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"


class _OrgPicker:
    """Per-document ORG surface chooser with realistic alias behaviour.

    Each core gets one per-doc mode on first use:
      * bare        — always "Core";
      * init        — always "SIA Core" (one fixed initialism);
      * intro_alias — first mention "SIA Core", later mentions bare
        "Core" (the news-wire convention) => a gold alias link.
    """

    def __init__(self, rng: random.Random, links: list[dict]):
        self.rng = rng
        self.links = links
        self.state: dict[str, tuple[str, str | None]] = {}
        self.seen_alias: set[str] = set()

    def __call__(self) -> str:
        core = self.rng.choice(ORG_CORES)
        if core not in self.state:
            r = self.rng.random()
            init = self.rng.choice(ORG_INITIALISMS)
            if r < 0.4:
                self.state[core] = ("bare", None)
            elif r < 0.7:
                self.state[core] = ("init", init)
            else:
                self.state[core] = ("intro_alias", init)
        mode, init = self.state[core]
        if mode == "bare":
            return core
        if mode == "init":
            return f"{init} {core}"
        # intro_alias
        if core not in self.seen_alias:
            self.seen_alias.add(core)
            return f"{init} {core}"
        if not any(
            l["alias"] == core and l["ne_type"] == "ORG" for l in self.links
        ):
            self.links.append(
                {"alias": core, "canonical": f"{init} {core}",
                 "ne_type": "ORG"})
        return core


def _fill(rng: random.Random, lo: int = 1, hi: int = 3) -> list[str]:
    return [rng.choice(FILLER) for _ in range(rng.randint(lo, hi))]


def gen_doc(doc_id: int, seed: int = 42) -> dict:
    """Compose one page. Pure function of (doc_id, seed)."""
    rng = random.Random((seed << 32) ^ doc_id)
    lang = LANGS[doc_id % len(LANGS)]

    mentions: list[dict] = []   # gold, filled via offsets after layout
    triples: list[dict] = []    # gold (url-local): sent marker added later
    links: list[dict] = []      # alias -> canonical
    _org = _OrgPicker(rng, links)
    # each sentence: list of (token_text, ne_type|None, entity_key|None)
    sentences: list[list[tuple[str, str | None, str | None]]] = []

    def ent_tokens(surface: str, ne_type: str, key: str | None = None):
        key = key or surface
        return [(tok, ne_type, key) for tok in surface.split(" ")]

    def add_triple(s, st, p, o, ot, kind):
        triples.append(
            {"subj": s, "subj_type": st, "pred": p, "obj": o,
             "obj_type": ot, "kind": kind, "sent_idx": len(sentences)}
        )

    n_core = rng.randint(8, 18)
    pending_second_occurrence: list[tuple[str, str]] = []  # (surface, type)
    for _ in range(n_core):
        kind = rng.random()
        sent: list[tuple[str, str | None, str | None]] = []
        if kind < 0.22:  # PERS verb ORG
            p, verb = _pers(rng), rng.choice(list(VERBS_ORG))
            o = _org()
            sent += ent_tokens(p, "PERS")
            sent += [(w, None, None) for w in _fill(rng, 0, 1)]
            sent.append((verb, None, None))
            sent += ent_tokens(o, "ORG")
            add_triple(p, "PERS", VERBS_ORG[verb], o, "ORG", "pattern")
        elif kind < 0.40:  # PERS verb LOC
            p, verb = _pers(rng), rng.choice(list(VERBS_LOC))
            loc = rng.choice(LOCATIONS)
            sent += ent_tokens(p, "PERS")
            sent.append((verb, None, None))
            sent += ent_tokens(loc, "LOC")
            add_triple(p, "PERS", VERBS_LOC[verb], loc, "LOC", "pattern")
        elif kind < 0.52:  # ORG atrodas LOC
            o, loc = _org(), rng.choice(LOCATIONS)
            sent += ent_tokens(o, "ORG")
            sent.append(("atrodas", None, None))
            sent += ent_tokens(loc, "LOC")
            add_triple(o, "ORG", "atrasties", loc, "LOC", "pattern")
        elif kind < 0.62:  # PERS satika PERS
            p1, p2 = _pers(rng), _pers(rng)
            if p1 != p2:
                sent += ent_tokens(p1, "PERS")
                sent.append(("satika", None, None))
                sent += ent_tokens(p2, "PERS")
                add_triple(p1, "PERS", "satikt", p2, "PERS", "pattern")
        elif kind < 0.72:  # co-occurrence, no verb between entities
            p, o = _pers(rng), _org()
            sent += ent_tokens(p, "PERS")
            sent.append((",", None, None))
            sent += ent_tokens(o, "ORG")
            sent += [(w, None, None) for w in _fill(rng, 2, 4)]
            add_triple(p, "PERS", "co_occurs", o, "ORG", "cooc")
        elif kind < 0.80:  # OOV PERS via honorific cue + later bare reuse
            core = rng.choice(OOV_PERS)
            sent += ent_tokens(core, "PERS")
            sent.append(("kungs", None, None))
            verb = rng.choice(list(VERBS_ORG))
            sent.append((verb, None, None))
            o = _org()
            sent += ent_tokens(o, "ORG")
            add_triple(core, "PERS", VERBS_ORG[verb], o, "ORG", "pattern")
            pending_second_occurrence.append((core, "PERS"))
        elif kind < 0.86:  # OOV ORG via "SIA X" initialism cue
            core = rng.choice(OOV_ORGS)
            surface = f"SIA {core}"
            loc = rng.choice(LOCATIONS)
            sent += ent_tokens(surface, "ORG")
            sent.append(("atrodas", None, None))
            sent += ent_tokens(loc, "LOC")
            add_triple(surface, "ORG", "atrasties", loc, "LOC", "pattern")
        elif kind < 0.93:  # alias sentence: full name then lastname-only
            fn, ln = rng.choice(FIRST_NAMES), rng.choice(LAST_NAMES)
            full = f"{fn} {ln}"
            loc = rng.choice(LOCATIONS)
            sent += ent_tokens(full, "PERS")
            sent.append(("dzīvo", None, None))
            sent += ent_tokens(loc, "LOC")
            add_triple(full, "PERS", "dzīvot", loc, "LOC", "pattern")
            sent.append((".", None, None))
            sentences.append(sent)
            # second sentence with the bare last name (gazetteer-known)
            sent2: list[tuple[str, str | None, str | None]] = []
            sent2 += [(w, None, None) for w in _fill(rng, 1, 2)]
            sent2 += ent_tokens(ln, "PERS")
            verb = rng.choice(list(VERBS_LOC))
            sent2.append((verb, None, None))
            loc2 = rng.choice(LOCATIONS)
            sent2 += ent_tokens(loc2, "LOC")
            add_triple(ln, "PERS", VERBS_LOC[verb], loc2, "LOC", "pattern")
            links.append({"alias": ln, "canonical": full, "ne_type": "PERS"})
            sent2.append((".", None, None))
            sentences.append(sent2)
            continue
        else:  # filler-only sentence, maybe with noise caps / url
            sent += [(w, None, None) for w in _fill(rng, 4, 8)]
            if rng.random() < 0.5:
                pos = rng.randint(1, len(sent))
                sent.insert(pos, (rng.choice(NOISE_CAPS), None, None))
            if rng.random() < 0.2:
                sent.append((rng.choice(URL_TOKENS), None, None))
        if not sent:
            continue
        sent.append((".", None, None))
        sentences.append(sent)

    # bare second occurrences of cue-introduced OOV entities (T-bait)
    for surface, ne_type in pending_second_occurrence:
        sent = [(w, None, None) for w in _fill(rng, 1, 3)]
        sent += ent_tokens(surface, ne_type)
        sent += [(w, None, None) for w in _fill(rng, 1, 2)]
        sent.append((".", None, None))
        sentences.append(sent)  # mention-only gold: no triple emitted

    # ------------------------------------------------ layout into lines
    # headline (ALL CAPS, no gold entities), then paragraphs of 1-3
    # sentences, one sentence per line, blank line between paragraphs.
    headline = " ".join(w.upper() for w in _fill(rng, 2, 4))
    lines: list[str] = [headline, ""]
    line_meta: list[list[tuple[str, str | None, str | None]] | None] = [None, None]
    sent_line_idx: dict[int, int] = {}
    i = 0
    while i < len(sentences):
        para_len = min(rng.randint(1, 3), len(sentences) - i)
        for j in range(para_len):
            sent_line_idx[i + j] = len(lines)
            lines.append(" ".join(tok for tok, _, _ in sentences[i + j]))
            line_meta.append(sentences[i + j])
        lines.append("")
        line_meta.append(None)
        i += para_len
    while lines and lines[-1] == "":
        lines.pop()
        line_meta.pop()

    # gold mention offsets (char coords, cols 0-based, col_to inclusive
    # like NEPreprocess.pm:400-404)
    for li, meta in enumerate(line_meta):
        if not meta:
            continue
        col = 0
        run_type, run_key, run_start, run_end_col = None, None, None, None
        line_text = lines[li]
        for tok, ne_type, key in meta + [("", None, None)]:
            if tok:
                start = line_text.index(tok, col)
                end = start + len(tok) - 1
                col = end + 2  # single space separator
            else:
                start = end = None
            if ne_type is not None and ne_type == run_type and key == run_key:
                run_end_col = end
            else:
                if run_type is not None:
                    mentions.append(
                        {"line_from": li, "col_from": run_start,
                         "line_to": li, "col_to": run_end_col,
                         "surface": line_text[run_start:run_end_col + 1],
                         "ne_type": run_type}
                    )
                run_type, run_key = ne_type, key
                run_start, run_end_col = start, end

    # attach line index to triples (sentence window id downstream is
    # derived from line order, identical by construction)
    for t in triples:
        t["line"] = sent_line_idx.get(t.pop("sent_idx"), -1)

    # ---------------------------------------------------------- html
    title = f"Doc {doc_id}"
    body_parts: list[str] = []
    para: list[str] = []
    for ln in lines:
        if ln == "":
            if para:
                body_parts.append("<p>" + "<br>".join(para) + "</p>")
                para = []
        else:
            para.append(ln.replace("&", "&amp;").replace("<", "&lt;"))
    if para:
        body_parts.append("<p>" + "<br>".join(para) + "</p>")
    noise_script = (
        "<script>var t = %d;</script>" % (doc_id % 7)
        if rng.random() < 0.5 else ""
    )
    html = (
        f"<html><head><title>{title}</title>{noise_script}"
        f"<style>p {{margin: 0}}</style></head><body>"
        + "".join(body_parts)
        + "</body></html>"
    )
    html_bytes = html.encode("utf-8")
    text = extract_text_py(html_bytes)

    url = f"https://crawl.example.{lang}/doc/{doc_id}"
    return {
        "url": url,
        "warc_ts": datetime(2024, 1, 1) + timedelta(seconds=doc_id),
        "html": html_bytes,
        "text": text,
        "lang": lang,
        "gold_mentions": mentions,
        "gold_triples": [t for t in triples],
        "gold_links": links,
    }


# ----------------------------------------------------------- spark side

_MENTION_T = T.ArrayType(T.StructType([
    T.StructField("line_from", T.IntegerType()),
    T.StructField("col_from", T.IntegerType()),
    T.StructField("line_to", T.IntegerType()),
    T.StructField("col_to", T.IntegerType()),
    T.StructField("surface", T.StringType()),
    T.StructField("ne_type", T.StringType()),
]))
_TRIPLE_T = T.ArrayType(T.StructType([
    T.StructField("subj", T.StringType()),
    T.StructField("subj_type", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("obj", T.StringType()),
    T.StructField("obj_type", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("line", T.IntegerType()),
]))
_LINK_T = T.ArrayType(T.StructType([
    T.StructField("alias", T.StringType()),
    T.StructField("canonical", T.StringType()),
    T.StructField("ne_type", T.StringType()),
]))

CORPUS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("gold_mentions", _MENTION_T),
    T.StructField("gold_triples", _TRIPLE_T),
    T.StructField("gold_links", _LINK_T),
])

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def corpus_df(spark: SparkSession, n_docs: int, seed: int = 42,
              partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: one row per page + gold cols."""
    partitions = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_doc(int(i), seed) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["gold_mentions"] = out["gold_mentions"].map(
                lambda ms: [tuple(m.values()) for m in ms])
            out["gold_triples"] = out["gold_triples"].map(
                lambda ts_: [tuple(t.values()) for t in ts_])
            out["gold_links"] = out["gold_links"].map(
                lambda ls: [tuple(l.values()) for l in ls])
            yield out

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )


def pages_df(spark: SparkSession, n_docs: int, seed: int = 42,
             partitions: int | None = None) -> DataFrame:
    return corpus_df(spark, n_docs, seed, partitions).select(*PAGES_COLUMNS)


def gazetteer_df(spark: SparkSession) -> DataFrame:
    """Gazetteer dimension (ne_type, surface, lemma_key); broadcast-sized.

    lemma_key mirrors the reference's lemma-keyed uniqueness hash
    (NEUtilities.pm:561-604): lowercase surface.
    """
    rows = [(t, s, s.lower()) for t, s in world_gazetteer()]
    df = spark.createDataFrame(rows, "ne_type string, surface string, lemma_key string")
    return df.dropDuplicates(["ne_type", "surface"])


def split_gold(corpus: DataFrame):
    """corpus -> (pages, gold_mentions, gold_triples, gold_links)."""
    pages = corpus.select(*PAGES_COLUMNS)
    gm = corpus.select("url", F.explode("gold_mentions").alias("m")).select(
        "url", "m.*")
    gt = corpus.select("url", F.explode("gold_triples").alias("t")).select(
        "url", "t.*")
    gl = corpus.select("url", F.explode("gold_links").alias("l")).select(
        "url", "l.*")
    return pages, gm, gt, gl
