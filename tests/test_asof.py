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


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Differential vs pandas.merge_asof — an independent reference
    implementation — across direction/strictness/tolerance on seeded
    random inputs with duplicate timestamps and missing keys."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for trial in range(4):
        n_l, n_r = 120, 150
        left_pd = pd.DataFrame({
            "k": rng.choice(list("abcd"), n_l),
            "lts": pd.to_datetime(
                rng.integers(0, 500, n_l), unit="s"),
            "lv": np.arange(n_l, dtype="int64"),
        })
        right_pd = pd.DataFrame({
            "k": rng.choice(list("abce"), n_r),   # 'e' never matches
            "rts": pd.to_datetime(
                rng.integers(0, 500, n_r), unit="s"),
            # unique rv so the deterministic tiebreak (max carry
            # tuple among ts-duplicates) is well-defined in pandas
            # terms: merge_asof takes the LAST among equal ts rows
            # after sorting, so sort by (rts, rv) to align
            "rv": rng.permutation(n_r).astype("int64"),
        })
        direction = ["backward", "forward"][trial % 2]
        strict = trial >= 2
        tol = pd.Timedelta(seconds=120) if trial == 1 else None

        ref = pd.merge_asof(
            left_pd.sort_values(["lts", "lv"]),
            right_pd.sort_values(["rts", "rv"]),
            left_on="lts", right_on="rts", by="k",
            direction=direction,
            allow_exact_matches=not strict,
            tolerance=tol)

        got = asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            ["k"], "lts", "rts", ["rv"],
            direction=direction, strict=strict,
            tolerance_s=None if tol is None else 120).collect()

        got_map = {r["lv"]: r["rv_r"] for r in got}
        assert len(got) == n_l
        for _, row in ref.iterrows():
            want = None if pd.isna(row["rv"]) else int(row["rv"])
            assert got_map[row["lv"]] == want, (
                trial, row["k"], row["lts"], want, got_map[row["lv"]])


def test_range_join_matches_bruteforce_randomized(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    ivals_pd = pd.DataFrame({
        "k": rng.choice(list("ab"), 40),
        "s": pd.to_datetime(rng.integers(0, 3000, 40), unit="s"),
        "iid": np.arange(40, dtype="int64"),
    })
    ivals_pd["e"] = ivals_pd["s"] + pd.to_timedelta(
        rng.integers(1, 900, 40), unit="s")
    pts_pd = pd.DataFrame({
        "k": rng.choice(list("ab"), 200),
        "pts": pd.to_datetime(rng.integers(0, 4000, 200), unit="s"),
        "pid": np.arange(200, dtype="int64"),
    })
    expect = {
        (int(i["iid"]), int(p["pid"]))
        for _, i in ivals_pd.iterrows()
        for _, p in pts_pd.iterrows()
        if i["k"] == p["k"] and i["s"] <= p["pts"] < i["e"]}
    got = {
        (r["iid"], r["pid"])
        for r in range_join(
            spark.createDataFrame(ivals_pd),
            spark.createDataFrame(pts_pd),
            ["k"], "s", "e", "pts", bucket_s=300).collect()}
    assert got == expect


def test_empty_sides(spark):
    left = _mk(spark, [], LEFT_SCHEMA)
    right = _mk(spark, [("a", _ts("2024-01-01 10:00:00"), 1)],
                RIGHT_SCHEMA)
    assert asof_join(left, right, ["k"], "lts", "rts",
                     ["rv"]).count() == 0
    one = _mk(spark, [("a", _ts("2024-01-01 10:00:00"), 1)],
              LEFT_SCHEMA)
    empty_r = _mk(spark, [], RIGHT_SCHEMA)
    out = asof_join(one, empty_r, ["k"], "lts", "rts",
                    ["rv"]).collect()
    assert len(out) == 1 and out[0]["rv_r"] is None
    assert range_join(
        _mk(spark, [], "k string, s timestamp, e timestamp"),
        _mk(spark, [], "k string, pts timestamp"),
        ["k"], "s", "e", "pts").count() == 0
