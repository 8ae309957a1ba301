"""Structured Streaming ingest (Trigger.AvailableNow drain)."""

from tildener_spark.datagen import corpus_df, split_gold, world_gazetteer
from tildener_spark.streaming.incremental import (
    run_available_now, stream_pages, tag_stream)


def test_available_now_drain(spark, tmp_path):
    corpus = corpus_df(spark, 8)
    pages, *_ = split_gold(corpus)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    pages.write.parquet(in_dir)

    stream = stream_pages(spark, in_dir)
    assert stream.isStreaming
    tagged = tag_stream(stream, world_gazetteer())
    run_available_now(tagged, out_dir, ck_dir)

    out = spark.read.parquet(out_dir)
    assert out.count() == 8
    assert set(out.columns) == {"url", "lang", "tokens"}

    # idempotent re-run: no new input -> no duplicate output
    stream2 = stream_pages(spark, in_dir)
    run_available_now(tag_stream(stream2, world_gazetteer()),
                      out_dir, ck_dir)
    assert spark.read.parquet(out_dir).count() == 8


def test_stateful_stream_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: a content hash is
    emitted exactly once over the life of the query."""
    import pyspark.sql.functions as F
    from tildener_spark.streaming.dedup import (
        dedup_stream, run_dedup_available_now)
    from tildener_spark.streaming.incremental import stream_pages

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    corpus = corpus_df(spark, 6)
    pages, *_ = split_gold(corpus)
    pages = pages.orderBy("url").cache()
    cols = ["url", "warc_ts", "html", "text", "lang"]
    all_rows = pages.select(*cols).collect()

    def write(rows, mode):
        spark.createDataFrame(rows, pages.select(*cols).schema) \
            .write.mode(mode).parquet(in_dir)

    # batch 1: 4 docs plus one exact-duplicate text under another url
    b1 = all_rows[:4]
    dup = b1[0].asDict()
    dup["url"] = dup["url"] + "#copy"
    write(b1 + [type(b1[0])(**dup)], "overwrite")

    run_dedup_available_now(
        dedup_stream(stream_pages(spark, in_dir)), out_dir, ck_dir)
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == 4  # 5 rows in, 1 duplicate swallowed
    assert out1.select("text_hash").distinct().count() == 4
    # representative is the min url of the duplicate pair
    assert out1.filter(F.col("url").endswith("#copy")).count() == 0

    # batch 2: re-send one old doc + two genuinely new docs
    old = b1[1].asDict()
    old["url"] = old["url"] + "#resend"
    write([type(b1[0])(**old)] + all_rows[4:6], "append")

    run_dedup_available_now(
        dedup_stream(stream_pages(spark, in_dir)), out_dir, ck_dir)
    out2 = spark.read.parquet(out_dir)
    # only the two new hashes were appended; the resent hash stayed
    # swallowed by the cross-batch state
    assert out2.count() == 6
    assert out2.select("text_hash").distinct().count() == 6
    assert out2.filter(F.col("url").endswith("#resend")).count() == 0


def test_watermarked_window_aggregation(spark, tmp_path):
    """Event-time windows + watermark: closed windows emit once; an
    event far behind the watermark is dropped, a late-but-within-
    horizon event updates its window before it closes."""
    import datetime as dt
    import pyspark.sql.functions as F
    from tildener_spark.streaming.windows import (
        run_windowed_available_now, stream_events, windowed_counts)

    in_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "ev_out")
    ck_dir = str(tmp_path / "ev_ck")
    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def rows(specs):
        return [(i, 1, T0 + dt.timedelta(minutes=m), et, 1.0)
                for i, (m, et) in enumerate(specs)]

    schema = ("event_id long, user_id long, ts timestamp, "
              "event_type string, value double")

    # batch 1: events in hours 0,1,2 and far ahead (hour 6) to push
    # the watermark past hours 0-3
    spark.createDataFrame(
        rows([(5, "a"), (65, "a"), (125, "b"), (360, "z")]),
        schema).write.mode("overwrite").parquet(in_dir)
    run_windowed_available_now(
        windowed_counts(stream_events(spark, in_dir)), out_dir, ck_dir)
    out1 = spark.read.parquet(out_dir)
    got1 = {(r["win_start"].hour, r["event_type"]): r["n"]
            for r in out1.collect()}
    # hours 0-2 closed (watermark = 6:00 - 2h = 4:00); hour 6 still open
    assert got1 == {(0, "a"): 1, (1, "a"): 1, (2, "b"): 1}

    # batch 2: an event at hour 1 is BEHIND the watermark -> dropped;
    # one in hour 5 is within horizon -> counted when its window
    # closes (push watermark with an hour-9 event)
    spark.createDataFrame(
        rows([(70, "late"), (310, "c"), (540, "z")]),
        schema).write.mode("append").parquet(in_dir)
    run_windowed_available_now(
        windowed_counts(stream_events(spark, in_dir)), out_dir, ck_dir)
    got2 = {(r["win_start"].hour, r["event_type"]): r["n"]
            for r in spark.read.parquet(out_dir).collect()}
    assert (5, "c") in got2        # late-but-in-horizon counted
    assert (6, "z") in got2        # previously open window now closed
    assert not any(et == "late" for _h, et in got2)  # dropped


def test_streaming_triples_match_batch_pipeline(spark, tmp_path):
    """The stateless triple chain streamed under AvailableNow emits
    exactly the batch pipeline's triples on the same pages."""
    from tildener_spark.config import EngineConfig
    from tildener_spark.datagen import gazetteer_df
    from tildener_spark.plans.pipeline import run_pipeline
    from tildener_spark.streaming.incremental import (
        run_available_now, stream_pages)
    from tildener_spark.streaming.triples import (
        TRIPLE_COLS, triple_stream)

    corpus = corpus_df(spark, 12)
    pages, *_ = split_gold(corpus)
    in_dir = str(tmp_path / "in")
    pages.write.parquet(in_dir)
    gaz_rows = [(r["ne_type"], r["surface"])
                for r in gazetteer_df(spark).collect()]

    streamed = triple_stream(stream_pages(spark, in_dir), gaz_rows)
    assert streamed.isStreaming
    out_dir = str(tmp_path / "out")
    run_available_now(streamed, out_dir, str(tmp_path / "ck"))

    cols = ["url", *TRIPLE_COLS]
    got = sorted(map(tuple, spark.read.parquet(out_dir)
                     .select(*cols).collect()))
    res = run_pipeline(spark, pages, gazetteer_df(spark),
                       EngineConfig())
    want = sorted(map(tuple, res.triples.select(*cols).collect()))
    assert got == want and len(got) > 0


def test_streaming_entity_stats_accumulate_across_batches(
        spark, tmp_path):
    """applyInPandasWithState running totals: after two drains the
    latest row per (ne_type, surface) equals the batch groupBy over
    everything ingested so far."""
    import pyspark.sql.functions as F
    from tildener_spark.datagen import gazetteer_df
    from tildener_spark.streaming.incremental import stream_pages
    from tildener_spark.streaming.triples import (
        entity_stats_stream, run_update_available_now, triple_stream)

    corpus = corpus_df(spark, 10)
    pages, *_ = split_gold(corpus)
    cols = ["url", "warc_ts", "html", "text", "lang"]
    rows = pages.select(*cols).orderBy("url").collect()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    gaz_rows = [(r["ne_type"], r["surface"])
                for r in gazetteer_df(spark).collect()]

    def drain():
        stats = entity_stats_stream(
            triple_stream(stream_pages(spark, in_dir), gaz_rows))
        run_update_available_now(stats, out_dir, ck_dir)

    def latest():
        out = spark.read.parquet(out_dir)
        w_max = out.groupBy("ne_type", "surface").agg(
            F.max("batch_id").alias("batch_id"))
        return {(r["ne_type"], r["surface"]):
                (r["first_seen"], r["last_seen"], r["n_endpoints"])
                for r in out.join(
                    w_max, ["ne_type", "surface", "batch_id"]).collect()}

    def expected(n_pages):
        batch = triple_stream(
            spark.createDataFrame(rows[:n_pages],
                                  pages.select(*cols).schema),
            gaz_rows)
        ep = (batch.select(F.col("subj_type").alias("ne_type"),
                           F.col("subj").alias("surface"), "warc_ts")
              .union(batch.select("obj_type", "obj", "warc_ts")))
        return {(r["ne_type"], r["surface"]):
                (r["first_seen"], r["last_seen"], r["n_endpoints"])
                for r in ep.groupBy("ne_type", "surface").agg(
                    F.min("warc_ts").alias("first_seen"),
                    F.max("warc_ts").alias("last_seen"),
                    F.count(F.lit(1)).alias("n_endpoints")).collect()}

    schema = pages.select(*cols).schema
    spark.createDataFrame(rows[:6], schema).write.mode(
        "overwrite").parquet(in_dir)
    drain()
    assert latest() == expected(6)

    spark.createDataFrame(rows[6:], schema).write.mode(
        "append").parquet(in_dir)
    drain()
    assert latest() == expected(10)
