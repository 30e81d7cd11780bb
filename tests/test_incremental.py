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


def test_incremental_winnow_matches_full_recompute_subset(spark):
    """The incremental path (batch fingerprints + stored state) must
    equal the full winnow_match_pairs run restricted to pairs touching
    a batch doc — fingerprints are per-document, so state union IS the
    full fingerprint set."""
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        incremental_winnow_matches,
        winnow_match_pairs,
        winnow_state,
    )

    base = "common tokens shared by every similar document here"
    rows = [(i, base + f" tail{i % 3}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    state = winnow_state(corpus, k=3, w=3)
    inc = {
        tuple(r)
        for r in incremental_winnow_matches(
            state, batch, k=3, w=3, min_shared=1, max_df=100
        ).collect()
    }
    batch_ids = {r["doc_id"] for r in batch.collect()}
    full = {
        tuple(r)
        for r in winnow_match_pairs(
            docs, k=3, w=3, min_shared=1, max_df=100
        ).collect()
        if r["id_a"] in batch_ids or r["id_b"] in batch_ids
    }
    assert inc == full and inc  # non-trivial: shared runs guarantee pairs


def test_incremental_winnow_hot_cap_spans_state_and_batch(spark):
    """A fingerprint hot in state+batch COMBINED (but not in either
    alone) must be dropped — the cap is the full-corpus cap."""
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        incremental_winnow_matches,
        winnow_state,
    )

    # every doc identical -> the single shared fingerprint has df = 6
    docs = spark.createDataFrame(
        [(i, "a b c d e f") for i in range(6)], "doc_id long, text string"
    )
    corpus = docs.filter(F.col("doc_id") < 4)   # df 4 in state
    batch = docs.filter(F.col("doc_id") >= 4)   # df 2 in batch
    state = winnow_state(corpus, k=3, w=3)
    out = incremental_winnow_matches(
        state, batch, k=3, w=3, min_shared=1, max_df=5
    ).collect()
    assert out == []  # combined df 6 > 5 -> every fp dropped
