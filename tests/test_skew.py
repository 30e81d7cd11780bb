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
