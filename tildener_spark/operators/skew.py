"""Salted equi-joins — the generic form of the skew defense used
inside the engine (LSH bucket caps, salted CC label propagation,
AQE skew-join splitting).

A hash join shuffles both sides by the key; a head key (one host
with half the crawl, one entity in every document) lands on ONE
reducer and serializes the whole stage.  Salting splits the hot
key's rows across ``n_salt`` reducers by widening the join key with
a deterministic per-row salt on the big side and replicating the
small(er) side once per salt value.  Cost: the replicated side
shuffles ``n_salt``× its size — worth it exactly when the biggest
key exceeds a reducer's fair share, which is why this is an explicit
operator (AQE's runtime skew splitting handles the common case; the
salted form is for keys so hot that even a split partition is one
straggler, and for deterministic plans where runtime re-splitting is
not wanted).

The salt is md5-derived from caller-named high-cardinality columns —
never ``rand()`` — so results replay bit-identically (the engine's
oracle contract) and a resumed stage recomputes the same partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_join"]


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                salt_cols: list[str], n_salt: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, salted: semantically
    identical to ``big.join(small, on, how)`` for ``inner``/
    ``left`` joins, but the shuffle key is ``on + salt`` so a hot
    key's rows spread over ``n_salt`` reducers.

    ``salt_cols``: big-side columns whose md5 spreads the hot key's
    rows (pick something row-distinguishing: a row id, url, line
    number).  ``small`` is replicated ``n_salt``× via one
    JVM-side explode — keep it the smaller side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left: {how}")
    salt = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                        for c in salt_cols])),
            1, 8), 16, 10).cast("long"),
        F.lit(n_salt)).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    return (b.join(s, [*on, "_salt"], how)
            .drop("_salt"))
