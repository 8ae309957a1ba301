"""Bootstrap components + self-training loop (BootstrapNEModel.pl)."""

import pyspark.sql.functions as F

from tildener_spark.config import EngineConfig
from tildener_spark.datagen import corpus_df, gazetteer_df, split_gold
from tildener_spark.operators.bootstrap import (
    gazetteer_candidates, merge_gazetteer, sentence_type_stats,
    top_sentences_per_type,
)
from tildener_spark.plans.bootstrap import bootstrap_loop


def _tokens(spark):
    rows = [
        # url, tok_id, sent_id, token, morpho, ne_tag, ne_prob
        ("u1", 0, 0, "Jānis", "Xxxxx", "B-PERS", 0.97),
        ("u1", 1, 0, "brauc", "xxxxx", "O", 0.97),
        ("u1", 2, 0, "uz", "xx", "O", 0.97),
        ("u1", 3, 0, "Rīgu", "Xxxx", "B-LOC", 0.93),
        ("u1", 4, 0, ".", "p", "O", 0.97),
        ("u1", 5, 1, "Īss", "Xxx", "O", 0.5),
        ("u1", 6, 1, "teikums", "xxxxxxx", "B-ORG", 0.9),
        ("u2", 0, 0, "Jānis", "Xxxxx", "B-PERS", 0.97),
        ("u2", 1, 0, "brauc", "xxxxx", "O", 0.97),
        ("u2", 2, 0, "uz", "xx", "O", 0.97),
        ("u2", 3, 0, "Rīgu", "Xxxx", "B-LOC", 0.93),
        ("u2", 4, 0, ".", "p", "O", 0.97),
    ]
    return spark.createDataFrame(
        rows, "url string, tok_id int, sent_id int, token string, "
              "morpho string, ne_tag string, ne_prob double")


def test_sentence_type_stats(spark):
    st = sentence_type_stats(_tokens(spark))
    rows = {(r["url"], r["sent_id"], r["tok_type"]): r
            for r in st.collect()}
    r = rows[("u1", 0, "PERS")]
    assert abs(r["type_prob"] - 0.97) < 1e-9
    # other tokens of u1/0 include the LOC token at 0.93
    assert abs(r["min_other_prob"] - 0.93) < 1e-9
    assert r["n_tokens"] == 5
    assert r["sent_text"] == "Jānis brauc uz Rīgu ."
    assert rows[("u1", 1, "ORG")]["min_other_prob"] == 0.5


def test_top_sentences_filters_and_dedup(spark):
    cfg = EngineConfig()  # min len 3, min other prob 0.8, fp cap 3
    top = top_sentences_per_type(_tokens(spark), k=5, cfg=cfg)
    rows = top.collect()
    # u1 sent 1 fails the length filter (2 tokens) and min_other_prob;
    # u1/0 and u2/0 are identical sentence strings -> dedup to one
    assert {r["tok_type"] for r in rows} == {"PERS", "LOC"}
    assert all(r["sent_text"] == "Jānis brauc uz Rīgu ." for r in rows)
    assert len(rows) == 2


def test_gazetteer_candidates_predicate(spark):
    mentions = spark.createDataFrame(
        [
            ("u1", "PERS", "Jānis Bērziņš", 2, 0.97),
            ("u1", "LOC", "Rīga", 1, 0.96),
            ("u1", "ORG", "lieta", 1, 0.99),      # all-lowercase -> out
            ("u1", "PERS", "Anna", 1, 0.80),      # low prob -> out
            ("u1", "DATE", "2001", 1, 0.99),      # type not eligible
            ("u1", "LOC", "Valmiera", 1, 0.95),   # already in gazetteer
        ],
        "url string, ne_type string, surface string, n_tokens int, "
        "avg_prob double")
    existing = spark.createDataFrame(
        [("LOC", "Valmiera")], "ne_type string, surface string")
    got = {(r["ne_type"], r["surface"])
           for r in gazetteer_candidates(mentions, existing).collect()}
    assert got == {("PERS", "Jānis Bērziņš"), ("LOC", "Rīga")}
    merged = merge_gazetteer(
        existing, gazetteer_candidates(mentions, existing))
    assert merged.count() == 3


def test_bootstrap_loop_grows_gazetteer_and_gates(spark):
    corpus = corpus_df(spark, 40).cache()
    pages, gold_mentions, _gt, _gl = split_gold(corpus)
    # dev = first 10 urls, unlabeled = rest
    urls = sorted(r["url"] for r in pages.select("url").collect())
    dev_urls, unl_urls = urls[:10], urls[10:]
    dev_pages = pages.filter(F.col("url").isin(dev_urls))
    unlabeled = pages.filter(F.col("url").isin(unl_urls))
    # dev gold tokens come from tagging with the FULL gazetteer (the
    # synthetic corpus is constructed so the full gazetteer is exact)
    from tildener_spark.operators.classify import make_tag_pages_udf
    from tildener_spark.operators.tokenize import explode_tokens
    full_gaz = gazetteer_df(spark)
    rows = [(r["ne_type"], r["surface"]) for r in full_gaz.collect()]
    gold_tokens = explode_tokens(
        dev_pages.select("url", make_tag_pages_udf(rows, EngineConfig())(
            F.col("text")).alias("tokens"))).cache()

    # start from a crippled gazetteer: drop half the PERS entries
    crippled = full_gaz.filter(
        ~((F.col("ne_type") == "PERS") & (F.crc32("surface") % 2 == 0)))
    # harvest threshold 0.90 so cue-based discoveries (honorific
    # PERS at 0.92, ORG_INIT runs at 0.90 — classify.py) are
    # eligible; at the reference default 0.95 only exact-gazetteer
    # matches qualify, which are by construction already present
    cfg = EngineConfig(gazetteer_min_prob=0.90)
    import tempfile
    with tempfile.TemporaryDirectory() as adir:
        res = bootstrap_loop(
            spark, unlabeled, dev_pages, gold_tokens, crippled,
            iterations=2, docs_per_iteration=20, metric="F", cfg=cfg,
            artifact_dir=adir)
        assert len(res.history) == 2
        # first iteration always accepted
        assert res.history[0]["accepted"]
        final_size = res.gazetteer.count()
        assert final_size > crippled.count()  # gazetteer grew
        for h in res.history:
            assert set(h["metrics"]) == {"P", "R", "F", "A"}
        # per-iteration classifier artifacts materialized (the DuckDB
        # step-replay oracle's inputs; also the stage checkpoint)
        for it in range(2):
            for name in ("dev_pred", "tokens", "mentions", "gaz"):
                t = spark.read.parquet(f"{adir}/it{it}_{name}.parquet")
                assert t.count() > 0, f"it{it}_{name} empty"
        # gazetteer growth is derivable: size_1 = size_0 + accepted
        # harvest of iteration 0
        g0 = spark.read.parquet(f"{adir}/it0_gaz.parquet").count()
        g1 = spark.read.parquet(f"{adir}/it1_gaz.parquet").count()
        assert g1 == g0 + res.history[0]["new_gazetteer_entries"]


def test_top_files_per_tag_selection(spark):
    from tildener_spark.operators.bootstrap import top_files_per_tag
    rows = []
    # u_good: high-prob PERS-rich doc; u_mid: mid; u_poor: low prob,
    # and only u_good/u_mid have >= 2 PERS tokens
    for url, p, n_pers in (("u_good", 0.99, 3), ("u_mid", 0.8, 2),
                           ("u_poor", 0.3, 1)):
        for i in range(n_pers):
            rows.append((url, i, 0, f"P{i}", "X", "B-PERS", p))
        rows.append((url, 9, 0, ".", "p", "O", p))
    toks = spark.createDataFrame(rows, (
        "url string, tok_id int, sent_id int, token string,"
        "morpho string, ne_tag string, ne_prob double"))
    sel = top_files_per_tag(toks, files_per_tag=2, min_tag_count=2)
    pers = {r["url"]: r["rank"] for r in sel.filter(
        F.col("ne_tag") == "B-PERS").collect()}
    # u_poor excluded (min_tag_count); order by rating desc
    assert pers == {"u_good": 1, "u_mid": 2}
    # rating = mean of per-tag means (BootstrapTools.pm:92-104)
    r = {x["url"]: x["rating"] for x in sel.collect()}
    assert abs(r["u_good"] - 0.99) < 1e-9


def test_bootstrap_loop_records_file_selection(spark):
    corpus = corpus_df(spark, 20).cache()
    pages, *_ = split_gold(corpus)
    urls = sorted(r["url"] for r in pages.select("url").collect())
    dev_pages = pages.filter(F.col("url").isin(urls[:5]))
    unlabeled = pages.filter(F.col("url").isin(urls[5:]))
    from tildener_spark.operators.classify import make_tag_pages_udf
    from tildener_spark.operators.tokenize import explode_tokens
    full_gaz = gazetteer_df(spark)
    rows = [(r["ne_type"], r["surface"]) for r in full_gaz.collect()]
    gold_tokens = explode_tokens(
        dev_pages.select("url", make_tag_pages_udf(rows, EngineConfig())(
            F.col("text")).alias("tokens")))
    res = bootstrap_loop(
        spark, unlabeled, dev_pages, gold_tokens, full_gaz,
        iterations=1, docs_per_iteration=10, files_per_tag=3)
    h = res.history[0]
    # the selection step ran and is bounded by the candidate sample
    assert 0 < h["selected_files"] <= 10
