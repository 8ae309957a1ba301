"""End-to-end pipeline + checkpoint/lineage/resume (north_rule)."""

import os
import shutil

import pyspark.sql.functions as F

from tildener_spark.config import EngineConfig
from tildener_spark.datagen import corpus_df, gazetteer_df, split_gold
from tildener_spark.plans.lineage import stage_counters
from tildener_spark.plans.pipeline import materialize, run_pipeline


def test_pipeline_checkpoint_and_resume(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    cfg = EngineConfig(checkpoint_dir=ckpt)
    corpus = corpus_df(spark, 20).cache()
    pages, gm, gt, gl = split_gold(corpus)
    gaz = gazetteer_df(spark)

    res = run_pipeline(spark, pages, gaz, cfg)
    n_triples = res.triples.count()
    n_mentions = res.mentions.count()
    assert n_triples > 0 and n_mentions > 0

    # lineage rows exist for every stage, with correct totals
    lin = stage_counters(spark, ckpt)
    by_stage = {
        r["stage"]: r["total"]
        for r in lin.groupBy("stage").agg(
            F.sum("rows").alias("total")).collect()
    }
    assert by_stage["mentions"] == n_mentions
    assert by_stage["triples_dc"] == n_triples
    assert set(by_stage) >= {
        "docs", "mentions", "triples_dc", "links", "entities",
        "mapping", "canonical_triples"}

    # observe() counters (SURVEY §7): every checkpointed stage
    # reports rows_out collected on its own write job, agreeing with
    # the lineage table, plus rows_in linked from its producing stage.
    # Non-stage guard audits (lsh_bucket_guard) ride the same dict
    # but have no lineage table.
    stage_rows = {k: c for k, c in res.counters.items()
                  if "rows_out" in c}
    assert set(stage_rows) == set(by_stage)
    assert "lsh_bucket_guard" in res.counters  # guard audit present
    for stage, c in stage_rows.items():
        assert c["rows_out"] == by_stage[stage], stage
        assert c["resumed"] is False, stage
    assert res.counters["docs"]["rows_in"] == \
        res.counters["docs"]["rows_out"]  # per-row map stage
    assert res.counters["mentions"]["rows_in"] == \
        res.counters["docs"]["rows_out"]
    assert res.counters["canonical_triples"]["rows_in"] == \
        res.counters["triples_dc"]["rows_out"]

    # simulate a crash after 'mentions': drop later stages, resume
    for stage in ("triples_dc", "links", "entities", "mapping",
                  "canonical_triples"):
        shutil.rmtree(os.path.join(ckpt, stage))
    res2 = run_pipeline(spark, pages, gaz, cfg)
    assert res2.triples.count() == n_triples
    assert res2.mentions.count() == n_mentions  # reloaded, not rebuilt

    # partial resume: 'mentions' was reloaded, not rebuilt — its
    # counter says so and still reports the committed row count
    assert res2.counters["mentions"] == {
        "rows_out": n_mentions, "resumed": True,
        "rows_in": res2.counters["docs"]["rows_out"]}
    assert res2.counters["triples_dc"]["resumed"] is False

    # full resume: everything present -> same results again
    res3 = run_pipeline(spark, pages, gaz, cfg)
    assert res3.canonical_triples.count() == res2.canonical_triples.count()
    assert all(c["resumed"] for c in res3.counters.values()
               if "resumed" in c)  # guard audits carry no resume flag
    assert res3.counters["triples_dc"]["rows_out"] == n_triples


def test_materialize_graph(spark, tmp_path):
    corpus = corpus_df(spark, 10)
    pages, *_ = split_gold(corpus)
    res = run_pipeline(spark, pages, gazetteer_df(spark), EngineConfig())
    paths = materialize(res, str(tmp_path / "graph"), buckets=4)
    assert paths["format"] == "parquet"
    nodes = spark.read.parquet(paths["nodes"])
    edges = spark.read.parquet(paths["edges"])
    assert nodes.count() > 0 and edges.count() > 0
    assert "bucket" in nodes.columns and "bucket" in edges.columns
    assert edges.filter(F.col("n_evidence") < 1).count() == 0

    # table_format switch (EngineConfig.table_format): the same writer
    # emits any DataFrameWriter format — orc is bundled in Spark, so it
    # stands in for iceberg (whose runtime jar this sandbox lacks).
    paths_orc = materialize(res, str(tmp_path / "graph_orc"),
                            buckets=4, fmt="orc")
    nodes_orc = spark.read.format("orc").load(paths_orc["nodes"])
    edges_orc = spark.read.format("orc").load(paths_orc["edges"])
    assert nodes_orc.count() == nodes.count()
    assert edges_orc.count() == edges.count()
    assert sorted(nodes_orc.columns) == sorted(nodes.columns)


def test_reextract_matches_embedded_text(spark):
    corpus = corpus_df(spark, 15)
    pages, *_ = split_gold(corpus)
    from tildener_spark.functions.text import extract_text
    mism = pages.withColumn("t2", extract_text("html")) \
        .filter(F.col("t2") != F.col("text")).count()
    assert mism == 0


def test_sliced_checkpoint_kill_and_resume(spark, tmp_path):
    """Per-slice resume (north_rule / SURVEY §4.3.5): kill after some
    slices committed -> only the missing slices recompute."""
    ckpt = str(tmp_path / "ckpt_sliced")
    cfg = EngineConfig(checkpoint_dir=ckpt, checkpoint_slices=4)
    corpus = corpus_df(spark, 24).cache()
    pages, *_ = split_gold(corpus)
    gaz = gazetteer_df(spark)

    res = run_pipeline(spark, pages, gaz, cfg)
    n_triples = res.triples.count()
    docs_dir = os.path.join(ckpt, "docs")
    slice_dirs = sorted(
        d for d in os.listdir(docs_dir) if d.startswith("slice_"))
    assert slice_dirs == [f"slice_{k}" for k in range(4)]
    # per-slice lineage rows exist
    lin = stage_counters(spark, ckpt)
    lin_stages = {r["stage"] for r in lin.select("stage").collect()}
    assert {f"docs/slice_{k}" for k in range(4)} <= lin_stages

    # simulate a crash: stage marker gone, one slice lost
    os.remove(os.path.join(docs_dir, "_SUCCESS"))
    shutil.rmtree(os.path.join(docs_dir, "slice_2"))
    # downstream stages must also recompute (they read docs)
    for stage in ("mentions", "triples_dc", "links", "entities",
                  "mapping", "canonical_triples"):
        shutil.rmtree(os.path.join(ckpt, stage))
    kept_mtimes = {
        d: os.path.getmtime(os.path.join(docs_dir, d, "_SUCCESS"))
        for d in ("slice_0", "slice_1", "slice_3")}

    res2 = run_pipeline(spark, pages, gaz, cfg)
    assert res2.triples.count() == n_triples
    # the three surviving slices were NOT rewritten
    for d, mt in kept_mtimes.items():
        assert os.path.getmtime(
            os.path.join(docs_dir, d, "_SUCCESS")) == mt, d
    # the lost slice was recomputed and the stage recommitted
    assert os.path.exists(os.path.join(docs_dir, "slice_2", "_SUCCESS"))
    assert os.path.exists(os.path.join(docs_dir, "_SUCCESS"))


def test_resume_rebuilds_missing_slice_lineage(spark, tmp_path):
    """A crash can land BETWEEN a slice's parquet commit and its
    lineage write: the data dir has _SUCCESS but no lineage exists.
    Resume must not crash (it did — found by the round-4
    kill-and-resume bench) and must rebuild the lineage rows from the
    committed data, restoring the audit trail."""
    ckpt = str(tmp_path / "ckpt_lin")
    cfg = EngineConfig(checkpoint_dir=ckpt, checkpoint_slices=4)
    corpus = corpus_df(spark, 24).cache()
    pages, *_ = split_gold(corpus)
    gaz = gazetteer_df(spark)
    res = run_pipeline(spark, pages, gaz, cfg)
    n_triples = res.triples.count()
    n_docs_rows = res.counters["docs"]["rows_out"]

    # crash window: docs stage marker gone (run died mid-stage), one
    # slice's data committed but its lineage rows never written
    docs_dir = os.path.join(ckpt, "docs")
    os.remove(os.path.join(docs_dir, "_SUCCESS"))
    shutil.rmtree(os.path.join(ckpt, "_lineage", "docs", "slice_1"))
    for stage in ("mentions", "triples_dc", "links", "entities",
                  "mapping", "canonical_triples"):
        shutil.rmtree(os.path.join(ckpt, stage))

    res2 = run_pipeline(spark, pages, gaz, cfg)
    assert res2.triples.count() == n_triples
    # counters still report the full row count (slice_1's share came
    # from the rebuilt lineage)
    assert res2.counters["docs"]["rows_out"] == n_docs_rows
    assert res2.counters["docs"]["resumed"] is True
    # the audit trail is whole again
    lin = stage_counters(spark, ckpt)
    rebuilt = lin.filter(F.col("stage") == "docs/slice_1")
    assert rebuilt.count() > 0


def test_checkpoint_slice_layout_mismatch_fails_fast(spark, tmp_path):
    """ADVICE r02: resuming a checkpoint with a different slice layout
    must fail with an explicit error, not silently mis-read data."""
    import pytest
    from tildener_spark.plans.lineage import checkpoint_stage
    ckpt = str(tmp_path / "ck")
    df = spark.range(100).withColumn("k", F.col("id").cast("string"))

    checkpoint_stage(spark, df, ckpt, "st", slices=4, slice_key="k")
    # sliced -> non-sliced resume
    with pytest.raises(ValueError, match="slices=4"):
        checkpoint_stage(spark, df, ckpt, "st")
    # sliced -> differently-sliced resume
    with pytest.raises(ValueError, match="slices=4"):
        checkpoint_stage(spark, df, ckpt, "st", slices=8, slice_key="k")
    # same layout resumes fine
    out = checkpoint_stage(spark, df, ckpt, "st", slices=4, slice_key="k")
    assert out.count() == 100
    # force recomputes under the new layout
    out2 = checkpoint_stage(spark, df, ckpt, "st", force=True)
    assert out2.count() == 100
    # non-sliced -> sliced resume now fails
    with pytest.raises(ValueError, match="slices=0"):
        checkpoint_stage(spark, df, ckpt, "st", slices=4, slice_key="k")


def test_checkpoint_over_hadoop_fs_uri(spark, tmp_path):
    """Scheme-qualified checkpoint dirs route marker/layout/lineage
    bookkeeping through the Hadoop FileSystem API (VERDICT r02 minor:
    the os.path fast path only applies to scheme-less local paths).
    file:// over the local FS exercises the same JVM code path an
    hdfs:// or s3a:// cluster deployment would hit."""
    from tildener_spark.plans.lineage import _FS, checkpoint_stage
    ckpt = "file://" + str(tmp_path / "ck_uri")
    fs = _FS(spark, ckpt)
    assert fs.local is False

    df = spark.range(60).withColumn("k", F.col("id").cast("string"))
    out = checkpoint_stage(spark, df, ckpt, "st", slices=3, slice_key="k")
    assert out.count() == 60
    local_root = str(tmp_path / "ck_uri" / "st")
    assert os.path.exists(os.path.join(local_root, "_SUCCESS"))
    assert open(os.path.join(local_root, "_LAYOUT")).read() == "slices=3\n"

    # resume: counters report the committed rows without recompute
    counters = {}
    out2 = checkpoint_stage(spark, df, ckpt, "st", slices=3,
                            slice_key="k", counters=counters)
    assert out2.count() == 60
    assert counters["st"] == {"rows_out": 60, "resumed": True}

    # layout mismatch still fails fast through the Hadoop branch
    import pytest
    with pytest.raises(ValueError, match="slices=3"):
        checkpoint_stage(spark, df, ckpt, "st")

    # lineage listing works over the URI too
    lin = stage_counters(spark, ckpt)
    assert lin.agg(F.sum("rows")).collect()[0][0] == 60


def test_crawl_prefilters(spark, tmp_path):
    """cfg.url_dedup + cfg.repetition_filter: duplicate-URL spellings
    and repetition-flagged pages are dropped ahead of tagging, and the
    result equals running the pipeline on the clean subset."""
    corpus = corpus_df(spark, 12).cache()
    pages, *_ = split_gold(corpus)
    gaz = gazetteer_df(spark)

    # pollute: a later-fetch URL-spelling variant of every page, plus
    # one boilerplate page that the repetition rules must flag
    variant = pages.select(
        F.concat(F.lit("HTTP://WWW."),
                 F.regexp_replace("url", r"^https://", ""),
                 F.lit("/?utm_source=1")).alias("url"),
        (F.col("warc_ts") + F.expr("interval 1 hour")).alias("warc_ts"),
        "html", "text", "lang")
    junk = spark.createDataFrame(
        [("https://spam.example.com/x",
          ("buy now pay later\n" * 40).strip(), "lv")],
        "url string, text string, lang string") \
        .withColumn("warc_ts", F.to_timestamp(F.lit("2026-01-01"))) \
        .withColumn("html", F.encode("text", "utf-8")) \
        .select("url", "warc_ts", "html", "text", "lang")
    dirty = pages.unionByName(variant).unionByName(junk)

    cfg = EngineConfig(url_dedup=True, repetition_filter=True)
    res_dirty = run_pipeline(spark, dirty, gaz, cfg)
    res_clean = run_pipeline(spark, pages, gaz, EngineConfig())
    assert sorted(map(tuple, res_dirty.canonical_triples.collect())) == \
        sorted(map(tuple, res_clean.canonical_triples.collect()))

    # checkpointed: the cleaned pages commit as their own stage with
    # a rows_out counter equal to the original page count
    ckpt = str(tmp_path / "ckpt_pref")
    cfg2 = EngineConfig(url_dedup=True, repetition_filter=True,
                        checkpoint_dir=ckpt)
    res2 = run_pipeline(spark, dirty, gaz, cfg2)
    res2.canonical_triples.count()
    n_pages = pages.count()
    assert res2.counters["pages_clean"]["rows_out"] == n_pages
    assert "rows_in" not in res2.counters["pages_clean"]
    assert res2.counters["docs"]["rows_in"] == n_pages
