"""Z-order layout: Morton key correctness and the pruning trade-off."""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.plans import QUERIES

from .conftest import TESTDATA_SMOKE


def test_morton_key_interleaves(spark):
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.layout import zorder_key_expr

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (4095, 4095)], ["d1", "d2"]
    )
    out = df.withColumn("z", F.expr(zorder_key_expr("d1", "d2"))).collect()
    def morton(a, b):
        z = 0
        for i in range(12):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z
    for r in out:
        assert r["z"] == morton(r["d1"], r["d2"]), (r["d1"], r["d2"])


def test_zorder_pruning_tradeoff(spark):
    rows = QUERIES["zorder_layout_pruning"].fn(spark, TESTDATA_SMOKE).collect()
    t = {(r["layout"], r["query"]): r for r in rows}
    # both layouts agree on actual matches (layout can't change results)
    for q in ("date_only", "price_only", "both"):
        assert t[("linear", q)]["rows_matched"] == t[("zorder", q)]["rows_matched"]
    # linear date-sorted layout degenerates to ~full scan for price-only
    assert t[("linear", "price_only")]["files_scanned"] == t[("linear", "price_only")]["n_files"]
    # z-order prunes the price-only box substantially better
    assert t[("zorder", "price_only")]["files_scanned"] < t[("linear", "price_only")]["files_scanned"]
    # linear stays best in its own sort dimension
    assert t[("linear", "date_only")]["files_scanned"] <= t[("zorder", "date_only")]["files_scanned"]
    # pruning is always sound: scanned >= matching
    for r in rows:
        assert r["files_scanned"] >= r["files_matching"]


def test_dynamic_partition_pruning_reaches_fact_scan(spark, tmp_path):
    """Catalyst's dynamic partition pruning, machine-checked: a
    date-partitioned fact joined to a filtered dimension scans only the
    partitions the dim filter selects — the runtime analogue of the
    static pruning layout_scan_stats measures. The dim must be a file
    source (a local relation never triggers DPP) and broadcast-able; the
    pruning subquery then shows up in the fact scan's PartitionFilters."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    orders.withColumn(
        "omonth", F.date_format("o_orderdate", "yyyy-MM")
    ).write.partitionBy("omonth").parquet(fact_path)
    spark.createDataFrame(
        [
            (f"{y}-{m:02d}", "Q1" if m <= 3 else "rest")
            for y in range(1995, 2002)
            for m in range(1, 13)
        ],
        "omonth string, quarter string",
    ).write.parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("quarter") == "Q1")
    j = fact.join(F.broadcast(dim), "omonth")
    got = j.count()

    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:1200]

    # and the pruned result is correct: exactly the Q1 months' orders
    want = orders.filter(
        F.date_format("o_orderdate", "MM").cast("int") <= 3
    ).count()
    assert got == want and got > 0
