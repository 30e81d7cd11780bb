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
