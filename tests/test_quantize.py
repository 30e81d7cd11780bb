"""Embedding quantization: code range, error bound, zero-vector guard."""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.operators.quantize import (
    quantization_report,
    quantize_embeddings,
)


def test_quantize_codes_and_error_bound(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = quantize_embeddings(emb).collect()
    assert out
    for r in out:
        assert all(-127 <= c <= 127 for c in r["q"]), "code out of int8 range"
        scale = r["scale"]
        for x, c in zip(r["embedding"], r["q"]):
            # round-to-nearest: dequant error <= half a quantization step
            assert abs(x - c * scale / 127) <= scale / 254 + 1e-9


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], ["vec_id", "embedding"])
    r = quantization_report(df).collect()[0]
    assert r["q_csv"] == "0,0,0" and r["mse_e9"] == 0 and r["scale_e6"] == 0


def test_quantize_report_mse_matches_manual(spark):
    df = spark.createDataFrame([(1, [1.0, -0.5, 0.25, 0.0])], ["vec_id", "embedding"])
    r = quantization_report(df).collect()[0]
    scale = 1.0
    q = [127, -63, 32, 0]  # floor(x/scale*127 + 0.5): half rounds toward +inf
    assert r["q_csv"] == ",".join(map(str, q))
    mse = sum((x - c * scale / 127) ** 2 for x, c in zip([1.0, -0.5, 0.25, 0.0], q)) / 4
    assert r["mse_e9"] == int(mse * 1e9 + 0.5)


def test_quantized_topk_high_recall_vs_exact(spark):
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.quantize import quantized_cosine_topk
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pred = F.col("vec_id") < 5
    quant = {(r["q_id"], r["cand_id"]) for r in quantized_cosine_topk(emb, pred, k=5).collect()}
    exact = {(r["q_id"], r["cand_id"]) for r in cosine_topk(emb, pred, k=5).collect()}
    assert quant and len(quant) == len(exact)
    recall = len(quant & exact) / len(exact)
    assert recall >= 0.8, recall  # int8 codes must track exact ranking closely
