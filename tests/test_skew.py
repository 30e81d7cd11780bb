"""Skew/co-location machinery tests: salted plans return identical
results; bucketed joins run with zero Exchange in the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.skew import (
    salted_join,
    salted_sum_count,
    write_bucketed,
)


def test_salted_sum_count_matches_plain_groupby(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["sum_value"], r["n_rows"])
        for r in salted_sum_count(li, ["l_returnflag"], "l_quantity").collect()
    }
    exp = {
        r["l_returnflag"]: (r["s"], r["c"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("*").alias("c"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][1] == exp[k][1]
        assert abs(got[k][0] - exp[k][0]) < 1e-6  # double sum, salt-order only


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    plain = li.join(o, "l_orderkey").count()
    salted = salted_join(li, o, "l_orderkey").count()
    assert salted == plain


def test_bucketed_join_is_shuffle_free(spark):
    import uuid

    suffix = uuid.uuid4().hex[:8]
    li_t, o_t = f"li_b_{suffix}", f"o_b_{suffix}"
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(li, li_t, "l_orderkey", n_buckets=4)
        write_bucketed(o, o_t, "l_orderkey", n_buckets=4)
        # At test scale the planner would broadcast the small side (moot for
        # bucketing); disable it to exercise the large-on-large path the
        # bucketing exists for.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(li_t).join(spark.table(o_t), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert "SortMergeJoin" in plan
        assert joined.count() == li.count()  # every line matches its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP TABLE IF EXISTS {li_t}")
        spark.sql(f"DROP TABLE IF EXISTS {o_t}")


def test_aqe_skew_join_splits_hot_partition(spark):
    """Runtime skew handling, machine-checked: with 95% of rows on one join
    key, AQE splits the hot shuffle partition (SortMergeJoin(skew=true))
    when nothing downstream requires the join's hash distribution. The
    negative case is asserted too: a groupBy on the join key downstream
    forbids the split (partitions can't be broken without re-shuffling) —
    which is exactly the situation the manual salting operators in this
    module exist for."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        big = spark.range(0, 200000).select(
            F.when(F.col("id") < 190000, F.lit(0))
            .otherwise(F.col("id") % 50 + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 51).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )

        free = big.join(dim, "k").select(F.sum(F.col("v") + F.col("w")).alias("s"))
        free.collect()
        plan = free._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:800]

        pinned = big.join(dim, "k").groupBy("k").agg(F.sum("v").alias("s"))
        pinned.collect()
        plan2 = pinned._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan2  # distribution requirement blocks the split
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_skew_key_report_hand_built(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.skew import skew_key_report
    import pyspark.sql.functions as F

    # key "hot" has 64 of 100 rows -> salt_factor ceil(32*64/100) = 21
    rows = [("hot",)] * 64 + [(f"k{i}",) for i in range(36)]
    df = spark.createDataFrame(rows, "user_id string")
    got = skew_key_report(df, "user_id", top_k=3).collect()
    assert got[0]["user_id"] == "hot"
    assert got[0]["n_rows"] == 64
    assert got[0]["share_ppm"] == 640000
    assert got[0]["salt_factor"] == 21
    assert all(r["salt_factor"] == 1 for r in got[1:])


def test_null_safe_left_join_matches_plain_left_join(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.skew import (
        null_safe_left_join,
    )
    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (None, 30.0), (None, 40.0), (9, 50.0)],
        "fk bigint, v double",
    )
    right = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "pk bigint, name string"
    )
    got = null_safe_left_join(left, right, "fk", "pk")
    exp = left.join(right, left["fk"] == right["pk"], "left").select(
        "fk", "v", "name"
    )
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, exp.collect()), key=key
    )
    # the structural guarantee: the nulls ride a union branch, and the
    # join input filters out null keys
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan


def test_null_safe_left_join_same_named_keys(spark):
    """Same-named join keys are the common shape — dropping the right key
    by name would remove both copies and crash."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.skew import (
        null_safe_left_join,
    )

    left = spark.createDataFrame(
        [(1, 10.0), (None, 30.0)], "id bigint, v double"
    )
    right = spark.createDataFrame([(1, "one")], "id bigint, name string")
    got = null_safe_left_join(left, right, "id", "id")
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        [(1, 10.0, "one"), (None, 30.0, None)], key=key
    )
