"""The testdata dtype self-check: a regenerated table whose time column
drifts off timestamp[us]/NTZ must fail loudly at `_t` time with a pointed
message (round 4 lost hours to a silent TIMESTAMP(NANOS) -> timestamp[us]
migration surfacing as per-entry DATATYPE_MISMATCH errors)."""

from __future__ import annotations

import pytest

from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import _t


def test_mistyped_time_column_fails_loudly(spark, tmp_path):
    bad = spark.range(5).selectExpr(
        "id AS event_id", "id AS user_id", "id * 1000000 AS ts"
    )
    bad.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    with pytest.raises(TypeError, match="testdata schema drift.*events.ts"):
        _t(spark, str(tmp_path), "events")


def test_real_testdata_passes_probe(spark):
    for name in ("events", "orders", "lineitem"):
        assert _t(spark, "/root/testdata/sf0.001", name).schema is not None


def test_missing_time_column_fails_loudly(spark, tmp_path):
    bad = spark.range(5).selectExpr(
        "id AS event_id", "id AS user_id", "timestamp_micros(id) AS event_ts"
    )
    bad.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    with pytest.raises(TypeError, match="testdata schema drift.*MISSING"):
        _t(spark, str(tmp_path), "events")
