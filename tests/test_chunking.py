"""Document chunking: coverage/overlap invariants and the zero-shuffle
plan guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.chunking import chunk_documents

from .conftest import TESTDATA_SMOKE


def test_chunk_layout_invariants(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(70))), (2, "a b c")],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, max_tokens=32, stride=24).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 70 tokens, stride 24 -> ceil(70/24) = 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_start"] for r in c1] == [0, 24, 48]
    assert [r["chunk_tokens"] for r in c1] == [32, 32, 22]  # tail clamped
    # full coverage: starts + lengths span [0, 70) with 8-token overlaps
    assert c1[-1]["chunk_start"] + c1[-1]["chunk_tokens"] == 70
    # doc 2 fits in one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_tokens"] == 3


def test_chunk_disjoint_when_stride_equals_max(spark):
    docs = spark.createDataFrame([(1, " ".join("x" * 1 for _ in range(100)))], ["doc_id", "text"])
    out = chunk_documents(docs, max_tokens=25, stride=25).collect()
    assert sum(r["chunk_tokens"] for r in out) == 100  # partition, no overlap


def test_chunk_rejects_bad_stride(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(docs, stride=64, max_tokens=32)


def test_chunk_plan_has_no_exchange(spark):
    docs = spark.read.parquet(f"{TESTDATA_SMOKE}/documents.parquet")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
