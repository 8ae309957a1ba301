"""Entity linking: containment rule, initialism handling, JW scores."""

import pytest

from tildener_spark.config import EngineConfig
from tildener_spark.operators.linking import (
    alias_links, jaro_winkler_py, lsh_candidate_pairs, with_minhash_bands)


def _mentions(spark, rows):
    return spark.createDataFrame(rows, (
        "url string, ne_type string, surface string, begin_tok int,"
        "avg_prob double"))


def test_jaro_winkler_values():
    assert jaro_winkler_py("abc", "abc") == 1.0
    assert jaro_winkler_py("", "abc") == 0.0
    assert jaro_winkler_py("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)
    assert jaro_winkler_py("dwayne", "duane") == pytest.approx(0.84, abs=1e-2)


def test_alias_links_containment(spark):
    m = _mentions(spark, [
        ("u", "PERS", "Jānis Bērziņš", 0, 0.97),
        ("u", "PERS", "Bērziņš", 10, 0.97),
    ])
    out = alias_links(m).collect()
    assert len(out) == 1
    assert (out[0]["alias"], out[0]["canonical"]) == (
        "Bērziņš", "Jānis Bērziņš")


def test_alias_prefers_nearest_preceding(spark):
    m = _mentions(spark, [
        ("u", "PERS", "Jānis Bērziņš", 0, 0.97),
        ("u", "PERS", "Pēteris Bērziņš", 5, 0.97),
        ("u", "PERS", "Bērziņš", 10, 0.97),
    ])
    out = alias_links(m).collect()
    assert len(out) == 1
    assert out[0]["canonical"] == "Pēteris Bērziņš"


def test_full_names_sharing_first_name_do_not_link(spark):
    m = _mentions(spark, [
        ("u", "PERS", "Elīna Rozīte", 0, 0.97),
        ("u", "PERS", "Elīna Balodis", 5, 0.97),
    ])
    assert alias_links(m).collect() == []


def test_initialisms_excluded_from_blocking(spark):
    m = _mentions(spark, [
        ("u", "ORG", "SIA Grauds", 0, 0.9),
        ("u", "ORG", "SIA Baltijas Banka", 5, 0.9),
    ])
    assert alias_links(m, initialisms={"SIA", "AS"}).collect() == []


def test_initialism_variant_links(spark):
    m = _mentions(spark, [
        ("u", "ORG", "SIA Baltijas Banka", 0, 0.9),
        ("u", "ORG", "Baltijas Banka", 5, 0.9),
    ])
    out = alias_links(m, initialisms={"SIA", "AS"}).collect()
    assert len(out) == 1
    assert (out[0]["alias"], out[0]["canonical"]) == (
        "Baltijas Banka", "SIA Baltijas Banka")


def test_no_cross_document_links(spark):
    m = _mentions(spark, [
        ("u1", "PERS", "Jānis Bērziņš", 0, 0.97),
        ("u2", "PERS", "Bērziņš", 10, 0.97),
    ])
    assert alias_links(m).collect() == []


def test_minhash_lsh_finds_near_duplicates(spark):
    ents = spark.createDataFrame(
        [("ORG", "Baltijas Banka"), ("ORG", "Baltijas Banke"),
         ("ORG", "Kurzemes Radio")],
        "ne_type string, surface string")
    pairs = lsh_candidate_pairs(ents)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert ("Baltijas Banka", "Baltijas Banke") in got
    assert ("Baltijas Banka", "Kurzemes Radio") not in got


def test_minhash_bands_deterministic(spark):
    df = spark.createDataFrame([("x", "abcdef")], "id string, s string")
    b1 = with_minhash_bands(df, "s").collect()[0]["bands"]
    b2 = with_minhash_bands(df, "s").collect()[0]["bands"]
    assert b1 == b2
    assert len(b1) == EngineConfig().minhash_bands


def test_banding_udf_not_duplicated_below_distinct(spark):
    """Plan-shape regression: Catalyst's InferFiltersFromGenerate +
    predicate pushdown used to clone the minhash-banding UDF below an
    upstream distinct, re-running it over every pre-distinct row
    (measured 26-40 s vs ~2 s at 200k docs).  lsh_candidate_pairs now
    persists the banded vocab as an optimizer barrier; this asserts
    the executed plan keeps exactly one banding UDF, above the
    aggregate."""
    import re

    base = spark.createDataFrame(
        [("ORG", "Baltijas Banka")] * 50 + [("ORG", "Kurzemes Radio")] * 50,
        "ne_type string, surface string")
    vocab = base.distinct()
    handles: list = []
    lsh_candidate_pairs(vocab, handles=handles)
    try:
        small = handles[0]
        plan = small._jdf.queryExecution().executedPlan().toString()
        # the banded-vocab cache child is where the UDF must live:
        # exactly one minhash ArrowEvalPython, and no aggregate above
        # it inside that child (i.e. the UDF consumes the distinct's
        # output, not its input)
        segments = plan.split("InMemoryRelation")
        for seg in segments:
            uses = seg.count("minhash_bands")
            if not uses:
                continue
            first_udf = seg.index("minhash_bands")
            first_agg = (seg.index("HashAggregate")
                         if "HashAggregate" in seg else len(seg))
            # plans print top-down: the UDF above the aggregate means
            # its line comes BEFORE the aggregate's
            assert first_udf < first_agg, (
                "banding UDF was pushed below the distinct:\n" + seg)
    finally:
        for h in handles:
            h.unpersist()
