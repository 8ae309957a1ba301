"""Salted joins (operators/skew.py): row-for-row parity with the
plain join, and evidence the salt actually spreads a hot key."""

from pyspark.sql import functions as F

from tildener_spark.operators.skew import salted_join


def _sides(spark):
    # hot key: user 0 owns 50% of the big side
    big = spark.createDataFrame(
        [(i, i % 2 * (i % 50 + 1), f"r{i}") for i in range(2000)],
        "row_id bigint, user_id bigint, payload string")
    small = spark.createDataFrame(
        [(u, u * 10) for u in range(0, 51)],
        "user_id bigint, score bigint")
    return big, small


def test_salted_inner_matches_plain(spark):
    big, small = _sides(spark)
    plain = sorted(map(tuple, big.join(small, "user_id")
                       .select("user_id", "row_id", "score")
                       .collect()))
    salted = sorted(map(tuple, salted_join(
        big, small, ["user_id"], salt_cols=["row_id"], n_salt=8)
        .select("user_id", "row_id", "score").collect()))
    assert salted == plain


def test_salted_left_keeps_unmatched(spark):
    big, small = _sides(spark)
    filtered = small.filter(F.col("user_id") > 25)
    plain = sorted(map(tuple, big.join(filtered, "user_id", "left")
                       .select("user_id", "row_id", "score")
                       .collect()))
    salted = sorted(map(tuple, salted_join(
        big, filtered, ["user_id"], salt_cols=["row_id"],
        n_salt=8, how="left")
        .select("user_id", "row_id", "score").collect()))
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    big, _ = _sides(spark)
    from tildener_spark.operators.skew import salted_join as _  # noqa
    # reproduce the operator's salt expression on the hot key's rows
    hot = big.filter(F.col("user_id") == 0)
    salt = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat_ws("\x1f",
                              F.col("row_id").cast("string"))),
            1, 8), 16, 10).cast("long"), F.lit(8)).cast("int")
    n_cells = hot.select(salt.alias("s")).distinct().count()
    assert n_cells == 8  # 1000 hot rows cover all 8 salt cells
