"""As-of joins and interval (range) joins — the two classic ordered
joins Spark has no built-in operator for, re-expressed so neither ever
materializes a range-predicate cross product.

As-of join (``asof_join``): for every left row, the single latest
right row with the same key and ``right_ts <= left_ts`` (backward
direction; forward is symmetric).  The naive Spark spelling — a
non-equi join on ``(key, right_ts <= left_ts)`` plus a max-window to
pick the winner — builds |left| x |right-per-key| intermediate rows,
quadratic in key activity and fatal for a hot key at crawl scale.
This implementation uses the union trick instead: tag each side, union
on an aligned schema, and run ONE ordered window per key with
``last(..., ignoreNulls=True)`` carrying the most recent right-side
payload forward onto left rows.  Cost is a single hash shuffle on the
key plus an in-partition sort — identical asymptotics to the
sort-merge join Spark would pick for an equi-join, and skew on the key
is plain sort skew (AQE-splittable), never a pair explosion.

Interval join (``range_join``): point-in-interval containment at scale
via coarse time-bucket binning.  Intervals explode into the buckets
they overlap (bounded by interval length / bucket width), points map
to exactly one bucket, and the bucket equi-join + exact containment
filter recovers precisely the true pairs.  Catalyst sees an ordinary
equi-join on (key, bucket), so AQE/broadcast/skew machinery all apply;
the worst case is driven by the chosen bucket width, not by |L|x|R|.

No reference analog (TildeNER has no temporal joins); these are the
beyond-reference operators a crawl/event pipeline needs (joining each
page fetch to the robots snapshot in force at fetch time, each
purchase to the attributing click, etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def _epoch_s(col):
    """Epoch seconds as double for either timestamp flavour: Spark 4
    refuses TIMESTAMP_NTZ -> DOUBLE directly, but NTZ -> LTZ -> DOUBLE
    is allowed, and the session-zone shift it applies is uniform across
    all rows, so bucket arithmetic and gap differences are unaffected
    (LTZ input passes through the first cast unchanged)."""
    return F.col(col).cast("timestamp_ltz").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_r",
    direction: str = "backward",
    tolerance_s: float | None = None,
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the
    single nearest ``right`` row per key in the given direction
    (``backward``: latest right with ``right_ts <= left_ts``;
    ``forward``: earliest right with ``right_ts >= left_ts``).

    Left rows with no admissible right row keep nulls (left-outer
    semantics).  ``tolerance_s`` additionally nulls out matches whose
    timestamp gap exceeds the given seconds.  ``strict=True`` makes
    the comparison strict (``<`` / ``>``): equal-timestamp right rows
    no longer match, which is the self-join-safe variant.

    Matched right columns come back as ``{col}{suffix}`` plus
    ``{right_ts}{suffix}`` (the matched row's own timestamp), so the
    caller can compute staleness without a second join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    carry = list(dict.fromkeys([right_ts, *right_cols]))
    # aligned union schema: keys, ts, side tag, left payload, right carry
    left_payload = [c for c in left.columns
                    if c not in keys and c != left_ts]
    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in carry],
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_payload],
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )

    # Ordering encodes the inequality: the scan direction makes
    # last() carry the nearest admissible right row, and the tie
    # order at equal ts decides inclusivity — right rows must sort
    # BEFORE left rows at equal ts to be visible to the inclusive
    # frame (strict flips that).  Among right rows tied on
    # (key, ts), the explicit carry-column tiebreak pins the winner
    # so the result is partitioning-invariant even with duplicate
    # right timestamps (carry columns must be orderable types;
    # pre-dedup the right side otherwise).  Left rows all carry null
    # _r_* so the null ordering of the tiebreak never reorders them
    # relative to right rows (the side column already separates the
    # sides), but it is pinned anyway for engine parity.
    tie = (F.col("_side").asc() if not strict
           else F.col("_side").desc())
    ts_ord = (F.col("_ts").asc() if direction == "backward"
              else F.col("_ts").desc())
    # carry tiebreak among right rows tied on (key, ts): backward
    # keeps the LAST of the tied rows under ascending carry order,
    # forward keeps the FIRST — matching pandas.merge_asof's
    # convention on (ts, carry)-sorted input, which the differential
    # test pins
    carry_tie = [
        (F.col(f"_r_{c}").asc_nulls_first()
         if direction == "backward"
         else F.col(f"_r_{c}").desc_nulls_first())
        for c in carry]
    order = [ts_ord, tie, *carry_tie]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    matched = lhs.unionByName(rhs).select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
          for c in carry],
    ).where(F.col("_side") == 1)

    gap_ok = F.lit(True)
    if tolerance_s is not None:
        gap = F.abs(
            F.col("_ts").cast("timestamp_ltz").cast("double")
            - F.col(f"_m_{right_ts}").cast("timestamp_ltz")
            .cast("double"))
        gap_ok = gap <= F.lit(float(tolerance_s))

    return matched.select(
        *[F.col(k) for k in keys],
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in left_payload],
        *[F.when(gap_ok, F.col(f"_m_{c}")).alias(f"{c}{suffix}")
          for c in carry],
    )


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    keys: list[str],
    start: str,
    end: str,
    point_ts: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Point-in-interval equi-ized range join: all (interval, point)
    pairs sharing ``keys`` with ``start <= point_ts < end``
    (half-open, so touching intervals never double-count a boundary
    point).

    Intervals are exploded onto the coarse ``bucket_s``-second grid
    they overlap via ``sequence()`` (JVM-side, no Python); points map
    to one bucket each; the join is a plain equi-join on
    (keys..., bucket) and the exact predicate is applied after.  Each
    true pair appears in exactly one bucket — the one containing the
    point — so no post-join distinct is needed.  Interval columns pass
    through; point columns pass through unchanged as well, so callers
    aggregate or project as a second step.
    """
    b = F.lit(int(bucket_s))
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(_epoch_s(start) / b).cast("long"),
            F.floor(_epoch_s(end) / b).cast("long"),
        )),
    )
    pts = points.withColumn(
        "_bucket",
        F.floor(_epoch_s(point_ts) / b).cast("long"))
    return (
        ivals.join(pts, [*keys, "_bucket"])
        .where((F.col(point_ts) >= F.col(start))
               & (F.col(point_ts) < F.col(end)))
        .drop("_bucket")
    )
