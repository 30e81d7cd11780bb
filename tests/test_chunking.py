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


def test_prefix_offsets_match_naive_cumsum(spark):
    """The bucketed two-phase prefix sum equals the naive global-window
    cumsum for every row, across bucket widths and sparse ids."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sports_data_integration_and_forecasting_pipeline_spark.operators.chunking import (
        global_prefix_offsets,
    )

    rows = [(i * 7 + (i % 3), (i * 13) % 50 + 1) for i in range(200)]  # sparse ids
    df = spark.createDataFrame(rows, "doc_id long, n long")
    naive = df.withColumn(
        "tok_start",
        F.coalesce(
            F.sum("n").over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).cast("bigint"),
    )
    want = {r["doc_id"]: r["tok_start"] for r in naive.collect()}
    for width in (1, 16, 4096):
        got = {
            r["doc_id"]: r["tok_start"]
            for r in global_prefix_offsets(df, "doc_id", "n", width).collect()
        }
        assert got == want, f"bucket_width={width}"


def test_pack_token_spans_boundaries(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.chunking import (
        pack_token_spans,
    )

    rows = [(1, "a " * 255 + "a"), (2, "b"), (3, "c " * 299 + "c")]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in pack_token_spans(df, seq_len=256).collect()}
    # doc 1 fills sequence 0 exactly
    assert (got[1]["tok_start"], got[1]["first_seq"], got[1]["last_seq"], got[1]["n_seqs"]) == (0, 0, 0, 1)
    # doc 2 starts sequence 1 at offset 256
    assert (got[2]["tok_start"], got[2]["first_seq"], got[2]["n_seqs"]) == (256, 1, 1)
    # doc 3 (300 tokens from 257) straddles sequences 1..2
    assert (got[3]["tok_start"], got[3]["first_seq"], got[3]["last_seq"], got[3]["n_seqs"]) == (257, 1, 2, 2)


def test_pack_counted_spans_generalizes_token_spans(spark):
    """pack_token_spans must be exactly pack_counted_spans over the
    whitespace counts (the refactor contract), and arbitrary counts
    (e.g. real BPE tokens) flow through the same prefix-sum packing."""
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.chunking import (
        pack_counted_spans,
        pack_token_spans,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i))) for i in range(6)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_token_spans(docs, seq_len=5).collect()))
    counts = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n")
    )
    b = sorted(map(tuple, pack_counted_spans(counts, seq_len=5, n_col="n").collect()))
    assert a == b
    # custom counts: doc k carries 10*k+1 tokens -> offsets are the
    # exact prefix sums
    c = spark.createDataFrame(
        [(k, 10 * k + 1) for k in range(4)], "doc_id long, n long"
    )
    got = {r["doc_id"]: (r["tok_start"], r["n_seqs"])
           for r in pack_counted_spans(c, seq_len=7, n_col="n").collect()}
    starts = {0: 0, 1: 1, 2: 12, 3: 33}
    import math
    for k in range(4):
        n = 10 * k + 1
        s = starts[k]
        assert got[k][0] == s
        assert got[k][1] == (s + n - 1) // 7 - s // 7 + 1
