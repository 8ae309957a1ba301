"""Cross-document surface merging (minhash-LSH blocking + JW scoring
-> hub-hub edges -> CC), the north-star linking stage."""

import pyspark.sql.functions as F

from tildener_spark.config import EngineConfig
from tildener_spark.operators.graph import build_entity_graph
from tildener_spark.operators.linking import jaro_winkler_py


def _mentions(spark):
    rows = [
        # same entity, diacritic/typo variants across documents
        ("u1", "PERS", "Janis Berzins", 0),
        ("u2", "PERS", "Janis Berzinsh", 0),
        # distinct people that must NOT merge
        ("u1", "PERS", "Anna Kalnina", 5),
        ("u3", "PERS", "Ilze Liepa", 0),
        # orgs: exact surface merges via hubs regardless of LSH
        ("u1", "ORG", "SIA Grauds", 9),
        ("u2", "ORG", "SIA Grauds", 9),
    ]
    return spark.createDataFrame(
        rows, "url string, ne_type string, surface string, begin_tok int")


def test_thresholds_are_sane():
    near = jaro_winkler_py("janis berzins", "janis berzinsh")
    far = jaro_winkler_py("janis berzins", "anna kalnina")
    cfg = EngineConfig()
    assert near >= cfg.cross_doc_min_score
    assert far < cfg.cross_doc_min_score


def test_cross_doc_merges_typo_variants(spark):
    cfg = EngineConfig(cross_doc_linking=True)
    g = build_entity_graph(_mentions(spark), cfg)
    ents = {r["canonical"]: r for r in g["entities"].collect()}
    # the two Janis variants collapse into ONE entity spanning 2 docs
    janis = [c for c in ents if c.startswith("Janis")]
    assert len(janis) == 1
    assert ents[janis[0]]["n_docs"] == 2
    assert ents[janis[0]]["n_surfaces"] == 2
    # unrelated people survive as their own entities
    assert "Anna Kalnina" in ents and "Ilze Liepa" in ents
    # exact-surface org merged by hubs
    assert ents["SIA Grauds"]["n_docs"] == 2


def test_cross_doc_can_be_disabled(spark):
    cfg = EngineConfig(cross_doc_linking=False)
    g = build_entity_graph(_mentions(spark), cfg)
    canons = {r["canonical"] for r in g["entities"].collect()}
    assert "Janis Berzins" in canons and "Janis Berzinsh" in canons
