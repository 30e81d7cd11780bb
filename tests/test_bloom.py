"""Bloom-filter semi-join pruning: soundness, prune-then-join equivalence,
and the no-shuffle probe-side plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prune,
)

from .conftest import TESTDATA_SMOKE


def _tables(spark):
    orders = spark.read.parquet(f"{TESTDATA_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{TESTDATA_SMOKE}/lineitem.parquet")
    return orders, lineitem


def test_bloom_no_false_negatives(spark):
    orders, lineitem = _tables(spark)
    keys = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_orderkey").alias("key")
    )
    bloom = bloom_build(keys, "key", n_bits=1024, k=3)
    probed = bloom_might_contain(
        lineitem.select("l_orderkey"), "l_orderkey", bloom, n_bits=1024, k=3
    )
    true_keys = {r["key"] for r in keys.collect()}
    for r in probed.collect():
        if r["l_orderkey"] in true_keys:
            assert r["bloom_pass"], "bloom dropped a true member"


def test_bloom_probe_with_bloom_named_column_survives(spark):
    """ADVICE r2: a probe df that itself has a `bloom` column must neither
    collide with the broadcast map nor lose its column; reserved working
    names raise instead of silently dropping user data."""
    import pytest

    orders, lineitem = _tables(spark)
    keys = orders.limit(100).select(F.col("o_orderkey").alias("key"))
    bloom = bloom_build(keys, "key", n_bits=1024, k=3)

    probe = lineitem.select("l_orderkey").withColumn("bloom", F.lit("user data"))
    out = bloom_might_contain(probe, "l_orderkey", bloom, n_bits=1024, k=3)
    assert set(out.columns) == {"l_orderkey", "bloom", "bloom_pass"}
    assert out.filter(F.col("bloom") != "user data").count() == 0

    clash = lineitem.select("l_orderkey").withColumn("__ps", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        bloom_might_contain(clash, "l_orderkey", bloom, n_bits=1024, k=3)


def test_bloom_prune_preserves_join(spark):
    orders, lineitem = _tables(spark)
    keys = orders.filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    plain = (
        lineitem.join(keys, lineitem["l_orderkey"] == keys["o_orderkey"])
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .collect()[0]
    )
    pruned_li = bloom_prune(
        lineitem, "l_orderkey", keys, small_key_col="o_orderkey", n_bits=2048
    )
    pruned = (
        pruned_li.join(keys, pruned_li["l_orderkey"] == keys["o_orderkey"])
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .collect()[0]
    )
    assert plain["n"] == pruned["n"] and plain["q"] == pruned["q"]
    # and the bloom actually pruned something vs the full table
    assert pruned_li.count() < lineitem.count()


def test_bloom_probe_side_never_shuffles(spark):
    orders, lineitem = _tables(spark)
    keys = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_orderkey").alias("key")
    )
    bloom = bloom_build(keys, "key")
    probed = bloom_might_contain(lineitem, "l_orderkey", bloom)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # exchanges exist only under the 1-row bloom build (collect_list agg);
    # the lineitem scan subtree must reach the BroadcastNestedLoopJoin
    # without an Exchange between scan and join
    scan_side = plan.split("BroadcastNestedLoopJoin")[1]
    assert "lineitem" in scan_side
    before_scan = scan_side.split("lineitem")[0]
    assert "Exchange" not in before_scan, plan
