"""As-of and range joins (operators/asof.py).

The q73/q74 oracles check the backward-inclusive as-of and the
point-in-interval join against DuckDB on the events table; these tests
pin the edges the oracle queries don't exercise: forward direction,
strictness, tolerance, boundary inclusivity, bucket-straddling
intervals, and duplicate-timestamp determinism.
"""

import datetime as dt

from pyspark.sql import functions as F

from tildener_spark.operators.asof import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


LEFT_SCHEMA = "k string, lts timestamp, lv bigint"
RIGHT_SCHEMA = "k string, rts timestamp, rv bigint"


def _result(df):
    return {tuple(r[c] for c in ("k", "lts", "lv")): (r["rts_r"], r["rv_r"])
            for r in df.collect()}


def test_backward_basic_and_outer_nulls(spark):
    left = _mk(spark, [
        ("a", _ts("2024-01-01 10:00:00"), 1),
        ("a", _ts("2024-01-01 12:00:00"), 2),
        ("b", _ts("2024-01-01 10:00:00"), 3),   # no right rows for b
    ], LEFT_SCHEMA)
    right = _mk(spark, [
        ("a", _ts("2024-01-01 09:00:00"), 10),
        ("a", _ts("2024-01-01 11:00:00"), 11),
        ("a", _ts("2024-01-01 13:00:00"), 12),  # after both left rows
    ], RIGHT_SCHEMA)
    out = _result(asof_join(left, right, ["k"], "lts", "rts", ["rv"]))
    assert out[("a", _ts("2024-01-01 10:00:00"), 1)] == (
        _ts("2024-01-01 09:00:00"), 10)
    assert out[("a", _ts("2024-01-01 12:00:00"), 2)] == (
        _ts("2024-01-01 11:00:00"), 11)
    assert out[("b", _ts("2024-01-01 10:00:00"), 3)] == (None, None)
    assert len(out) == 3  # left-outer: every left row survives


def test_equal_ts_inclusive_vs_strict(spark):
    left = _mk(spark, [("a", _ts("2024-01-01 10:00:00"), 1)], LEFT_SCHEMA)
    right = _mk(spark, [
        ("a", _ts("2024-01-01 09:00:00"), 10),
        ("a", _ts("2024-01-01 10:00:00"), 11),
    ], RIGHT_SCHEMA)
    inc = _result(asof_join(left, right, ["k"], "lts", "rts", ["rv"]))
    assert inc[("a", _ts("2024-01-01 10:00:00"), 1)][1] == 11
    st = _result(asof_join(left, right, ["k"], "lts", "rts", ["rv"],
                           strict=True))
    assert st[("a", _ts("2024-01-01 10:00:00"), 1)][1] == 10


def test_forward_direction(spark):
    left = _mk(spark, [
        ("a", _ts("2024-01-01 10:00:00"), 1),
        ("a", _ts("2024-01-01 14:00:00"), 2),   # nothing at/after
    ], LEFT_SCHEMA)
    right = _mk(spark, [
        ("a", _ts("2024-01-01 09:00:00"), 10),
        ("a", _ts("2024-01-01 11:00:00"), 11),
        ("a", _ts("2024-01-01 12:00:00"), 12),
    ], RIGHT_SCHEMA)
    out = _result(asof_join(left, right, ["k"], "lts", "rts", ["rv"],
                            direction="forward"))
    assert out[("a", _ts("2024-01-01 10:00:00"), 1)] == (
        _ts("2024-01-01 11:00:00"), 11)
    assert out[("a", _ts("2024-01-01 14:00:00"), 2)] == (None, None)


def test_forward_equal_ts_inclusive(spark):
    left = _mk(spark, [("a", _ts("2024-01-01 10:00:00"), 1)], LEFT_SCHEMA)
    right = _mk(spark, [("a", _ts("2024-01-01 10:00:00"), 11)],
                RIGHT_SCHEMA)
    out = _result(asof_join(left, right, ["k"], "lts", "rts", ["rv"],
                            direction="forward"))
    assert out[("a", _ts("2024-01-01 10:00:00"), 1)][1] == 11


def test_tolerance_nulls_stale_matches(spark):
    left = _mk(spark, [("a", _ts("2024-01-01 10:00:00"), 1)], LEFT_SCHEMA)
    right = _mk(spark, [("a", _ts("2024-01-01 08:00:00"), 10)],
                RIGHT_SCHEMA)
    ok = _result(asof_join(left, right, ["k"], "lts", "rts", ["rv"],
                           tolerance_s=3 * 3600))
    assert ok[("a", _ts("2024-01-01 10:00:00"), 1)][1] == 10
    stale = _result(asof_join(left, right, ["k"], "lts", "rts", ["rv"],
                              tolerance_s=3600))
    assert stale[("a", _ts("2024-01-01 10:00:00"), 1)] == (None, None)


def test_duplicate_right_ts_deterministic(spark):
    # two right rows tied on (key, ts): the pinned carry tiebreak
    # (asc, last() takes the max) must pick rv=12 on every run and
    # under adversarial repartitioning
    left = _mk(spark, [("a", _ts("2024-01-01 10:00:00"), 1)], LEFT_SCHEMA)
    right = _mk(spark, [
        ("a", _ts("2024-01-01 09:00:00"), 12),
        ("a", _ts("2024-01-01 09:00:00"), 11),
    ], RIGHT_SCHEMA)
    for right_variant in (right, right.repartition(7), right.coalesce(1)):
        out = _result(asof_join(left, right_variant, ["k"], "lts",
                                "rts", ["rv"]))
        assert out[("a", _ts("2024-01-01 10:00:00"), 1)][1] == 12


def test_range_join_boundaries_and_straddle(spark):
    # interval spans two hour buckets; half-open [start, end)
    ivals = _mk(spark, [
        ("a", _ts("2024-01-01 10:30:00"), _ts("2024-01-01 11:30:00"), 1),
    ], "k string, s timestamp, e timestamp, iid bigint")
    pts = _mk(spark, [
        ("a", _ts("2024-01-01 10:30:00"), 100),  # == start: in
        ("a", _ts("2024-01-01 10:59:59"), 101),  # bucket 1: in
        ("a", _ts("2024-01-01 11:00:00"), 102),  # bucket 2: in
        ("a", _ts("2024-01-01 11:30:00"), 103),  # == end: out
        ("a", _ts("2024-01-01 12:00:01"), 104),  # after: out
        ("b", _ts("2024-01-01 10:45:00"), 105),  # other key: out
    ], "k string, pts timestamp, pv bigint")
    got = sorted(r["pv"] for r in range_join(
        ivals, pts, ["k"], "s", "e", "pts", bucket_s=3600).collect())
    assert got == [100, 101, 102]


def test_range_join_no_duplicate_pairs(spark):
    # a long interval overlaps many buckets but each contained point
    # must appear exactly once (points join only in their own bucket)
    ivals = _mk(spark, [
        ("a", _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"), 1),
    ], "k string, s timestamp, e timestamp, iid bigint")
    pts = _mk(spark, [
        ("a", _ts("2024-01-01 05:05:00"), 100),
        ("a", _ts("2024-01-01 23:59:59"), 101),
    ], "k string, pts timestamp, pv bigint")
    out = range_join(ivals, pts, ["k"], "s", "e", "pts",
                     bucket_s=600)
    assert out.groupBy("pv").count().filter(
        F.col("count") > 1).count() == 0
    assert out.count() == 2
