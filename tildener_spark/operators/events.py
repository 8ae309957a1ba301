"""Ordered-funnel analysis over an event stream.

The classic product/behavior query a crawl-or-clickstream warehouse
answers: of the users who did step 1, how many later did step 2,
then step 3?  Semantics are the standard "first-occurrence chain":
a user reaches step i when an event of that type exists at or after
the user's reach time of step i-1; the reach time is the EARLIEST
such event (repeats and interleaved other events are allowed).

Scale shape: one user-keyed aggregate per step — step i filters the
event stream by type (pushed to the scan), joins the (user,
reach_time) table from step i-1 (user-keyed hash join; both sides
shrink monotonically), and takes a min.  No windows over the full
stream, no per-user event collection; the widest shuffle is the
first step's user-keyed partial-agg.  The summary is a union of
global single-row aggregates plus a lag over |steps| rows.

No reference analog (TildeNER has no event stream); beyond-reference
breadth for the events table, exact-oracled (q77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["funnel"]


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> DataFrame:
    """Per-stage reach counts and step conversion for the ordered
    ``steps`` funnel.

    Returns (stage_idx, stage, n_users, conv_from_prev) — one row
    per step, ``conv_from_prev`` = n_i / n_{i-1} rounded to 6
    (1.0 for the first step), 0-user tail stages included.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = events.select(user_col, type_col, ts_col)
    stage_counts = []
    prev: DataFrame | None = None
    for i, s in enumerate(steps):
        cur = base.filter(F.col(type_col) == s)
        if prev is not None:
            cur = (cur.join(prev, user_col)
                   .filter(F.col(ts_col) >= F.col("_reach")))
        reach = cur.groupBy(user_col).agg(
            F.min(ts_col).alias("_reach"))
        stage_counts.append(
            reach.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
            .select(F.lit(i).cast("long").alias("stage_idx"),
                    F.lit(s).alias("stage"), "n_users"))
        prev = reach
    summary = stage_counts[0]
    for sc in stage_counts[1:]:
        summary = summary.unionByName(sc)
    w = Window.orderBy("stage_idx")
    return summary.select(
        "stage_idx", "stage", "n_users",
        F.when(F.lag("n_users").over(w).isNull(), F.lit(1.0))
        .when(F.lag("n_users").over(w) == 0, F.lit(0.0))
        .otherwise(F.round(
            F.col("n_users").cast("double")
            / F.lag("n_users").over(w).cast("double"), 6))
        .alias("conv_from_prev"))
