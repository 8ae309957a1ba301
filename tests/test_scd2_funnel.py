"""SCD-2 version intervals (operators/urls.py scd2_versions) and
ordered funnels (operators/events.py funnel) — semantics edges the
q76/q77 oracles don't isolate: collapse of unchanged refetches,
A->B->A reopening, interval adjacency, funnel ordering (a purchase
BEFORE the click must not count), and empty tail stages.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tildener_spark.operators.events import funnel
from tildener_spark.operators.urls import scd2_versions


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_scd2_collapse_and_reopen(spark):
    crawl = spark.createDataFrame([
        ("u", _ts("2024-01-01 00:00:00"), "A"),
        ("u", _ts("2024-01-02 00:00:00"), "A"),   # unchanged: collapse
        ("u", _ts("2024-01-03 00:00:00"), "B"),   # change
        ("u", _ts("2024-01-04 00:00:00"), "A"),   # back to A: NEW row
    ], "url string, warc_ts timestamp, text string")
    rows = sorted(scd2_versions(crawl).collect(),
                  key=lambda r: r["version"])
    assert len(rows) == 3
    assert [r["version"] for r in rows] == [1, 2, 3]
    # intervals are adjacent half-open: each valid_to == next
    # valid_from, live row open-ended
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    assert rows[1]["valid_to"] == rows[2]["valid_from"]
    assert rows[2]["valid_to"] is None and rows[2]["is_current"]
    assert rows[0]["fp"] == rows[2]["fp"]          # A == A
    assert rows[0]["fp"] != rows[1]["fp"]


def test_scd2_single_fetch_is_current(spark):
    crawl = spark.createDataFrame(
        [("u", _ts("2024-01-01 00:00:00"), "only")],
        "url string, warc_ts timestamp, text string")
    [r] = scd2_versions(crawl).collect()
    assert (r["version"], r["valid_to"], r["is_current"]) \
        == (1, None, True)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp")


def test_funnel_order_matters(spark):
    e = _events(spark, [
        # u1 completes in order
        (1, "view", _ts("2024-01-01 10:00:00")),
        (1, "click", _ts("2024-01-01 11:00:00")),
        (1, "purchase", _ts("2024-01-01 12:00:00")),
        # u2 purchases BEFORE clicking: stops at click
        (2, "view", _ts("2024-01-01 10:00:00")),
        (2, "purchase", _ts("2024-01-01 10:30:00")),
        (2, "click", _ts("2024-01-01 11:00:00")),
        # u3 never views: counts nowhere
        (3, "click", _ts("2024-01-01 10:00:00")),
    ])
    got = {r["stage"]: r for r in funnel(
        e, ["view", "click", "purchase"]).collect()}
    assert got["view"]["n_users"] == 2
    assert got["click"]["n_users"] == 2
    assert got["purchase"]["n_users"] == 1
    assert got["view"]["conv_from_prev"] == 1.0
    assert got["click"]["conv_from_prev"] == 1.0
    assert got["purchase"]["conv_from_prev"] == 0.5


def test_funnel_equal_ts_counts(spark):
    # simultaneous view+click: >= lets the same-instant step count
    e = _events(spark, [
        (1, "view", _ts("2024-01-01 10:00:00")),
        (1, "click", _ts("2024-01-01 10:00:00")),
    ])
    got = {r["stage"]: r["n_users"]
           for r in funnel(e, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_funnel_empty_tail_stage(spark):
    e = _events(spark, [(1, "view", _ts("2024-01-01 10:00:00"))])
    got = {r["stage"]: (r["n_users"], r["conv_from_prev"])
           for r in funnel(e, ["view", "click", "purchase"]).collect()}
    assert got["click"] == (0, 0.0)
    # conversion out of a 0-user stage is pinned to 0.0, not a NaN
    assert got["purchase"] == (0, 0.0)


def test_funnel_empty_steps_raise(spark):
    with pytest.raises(ValueError):
        funnel(_events(spark, []), [])
