"""Bucketed co-located joins (sources/bucketed.py): the q78 oracle
checks the ANSWER; these tests check the PLAN — the whole point of
bucketing is that the recurring join carries no Exchange."""

from pyspark.sql import functions as F

from tildener_spark.sources.bucketed import write_bucketed

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    li = write_bucketed(
        spark, spark.read.parquet(f"{SF}/lineitem.parquet"),
        "t_li_bucket_test", "l_orderkey", 4)
    od = write_bucketed(
        spark, spark.read.parquet(f"{SF}/orders.parquet"),
        "t_od_bucket_test", "o_orderkey", 4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (broadcast would hide the
        # bucketing evidence; at real scale neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = li.join(od, li.l_orderkey == od.o_orderkey)
        j.count()  # finalize AQE
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_exchange(spark):
    # control: the same join off raw parquet MUST shuffle — proves
    # the assertion above is measuring bucketing, not a vacuous pass
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    od = spark.read.parquet(f"{SF}/orders.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = li.join(od, li.l_orderkey == od.o_orderkey)
        j.count()
        assert "Exchange hashpartitioning" in _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_answer_matches_plain(spark):
    li_b = write_bucketed(
        spark, spark.read.parquet(f"{SF}/lineitem.parquet"),
        "t_li_bucket_ans", "l_orderkey", 4)
    od_b = write_bucketed(
        spark, spark.read.parquet(f"{SF}/orders.parquet"),
        "t_od_bucket_ans", "o_orderkey", 4)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    od = spark.read.parquet(f"{SF}/orders.parquet")

    def agg(l, o):
        return sorted(map(tuple, (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("l_quantity").cast("long").alias("q"))
            .collect())))

    assert agg(li_b, od_b) == agg(li, od)
