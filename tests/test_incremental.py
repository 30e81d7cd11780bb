"""Incremental rollup maintenance: merge == recompute, disjoint-group
union semantics, non-decomposable rejection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.incremental import (
    merge_rollups,
    rollup_partial,
)


def test_merge_equals_recompute_under_any_split(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id", F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("v")
    )
    keys = ["event_type"]
    metrics = {"s": ("sum", "v"), "n": ("count", ""), "lo": ("min", "v"), "hi": ("max", "v")}
    kinds = {"s": "sum", "n": "count", "lo": "min", "hi": "max"}
    full = {tuple(r[k] for k in keys): r.asDict() for r in rollup_partial(ev, keys, metrics).collect()}
    # three-way split on an unrelated column
    parts = [rollup_partial(ev.filter(F.col("user_id") % 3 == i), keys, metrics) for i in range(3)]
    merged = {tuple(r[k] for k in keys): r.asDict() for r in merge_rollups(parts, keys, kinds).collect()}
    assert merged == full


def test_merge_handles_groups_missing_from_some_partials(spark):
    a = spark.createDataFrame([("x", 1, 1, 5, 5)], ["k", "s", "n", "lo", "hi"])
    b = spark.createDataFrame([("y", 7, 2, 3, 4)], ["k", "s", "n", "lo", "hi"])
    out = {r["k"]: r.asDict() for r in merge_rollups(
        [a, b], ["k"], {"s": "sum", "n": "count", "lo": "min", "hi": "max"}
    ).collect()}
    assert out["x"]["s"] == 1 and out["y"]["n"] == 2


def test_non_decomposable_kind_rejected(spark):
    df = spark.createDataFrame([("x", 1)], ["k", "v"])
    with pytest.raises(ValueError):
        rollup_partial(df, ["k"], {"m": ("median", "v")})
    with pytest.raises(ValueError):
        merge_rollups([df], ["k"], {"v": "avg"})
