"""Embedding quantization — symmetric int8 scalar quantization of
vector columns, the memory/bandwidth lever for ANN at scale (a 64-dim
float32 vector becomes 64 bytes + one scale: 4x smaller, SIMD-friendly
for downstream distance kernels).

Per vector: ``scale = max |x_i|``; ``q_i = round(x_i / scale * 127)``
(int8 range, symmetric, zero-preserving); dequantization error is
reported as per-vector MSE. ENTIRELY narrow — transform/aggregate over
the array column, zero shuffles, zero Python; 100 TB of embeddings
quantize at scan speed.

Everything is deterministic double arithmetic in a fixed fold order, so
the battery entry hash-matches DuckDB (quantized codes exactly; MSE at
integer nano precision). No reference counterpart; part of the
similarity/ANN family (`operators/similarity.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 127,
) -> DataFrame:
    """``(id, dim, scale, q)`` — ``q`` the int codes array; zero vectors
    quantize to all-zero codes."""
    staged = df.select(
        F.col(id_col),
        F.col(emb_col).alias("__e"),
        # staged once: referenced by every code and the error fold
        F.array_max(F.transform(emb_col, lambda x: F.abs(x)))
        .cast("double")
        .alias("scale"),
    )
    q = F.when(
        F.col("scale") == 0,
        F.transform("__e", lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            "__e",
            lambda x: F.floor(
                x.cast("double") / F.col("scale") * levels + F.lit(0.5)
            ).cast("int"),
        )
    )
    return staged.select(
        id_col,
        F.size("__e").cast("bigint").alias("dim"),
        "scale",
        q.alias("q"),
        F.col("__e").alias(emb_col),
    )


def quantization_report(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 127,
) -> DataFrame:
    """Battery-friendly projection: codes as CSV, scale and dequant-MSE
    snapped to integer micro/nano grids (engine-exact)."""
    qd = quantize_embeddings(df, emb_col, id_col, levels)
    err_sq = F.zip_with(
        emb_col,
        "q",
        lambda x, qi: F.pow(
            x.cast("double") - qi * F.col("scale") / levels, F.lit(2)
        ),
    )
    mse = F.aggregate(
        err_sq, F.lit(0.0), lambda acc, e: acc + e
    ) / F.col("dim")
    return qd.select(
        id_col,
        "dim",
        F.floor(F.col("scale") * 1e6 + 0.5).cast("bigint").alias("scale_e6"),
        F.array_join(
            F.transform("q", lambda x: x.cast("string")), ","
        ).alias("q_csv"),
        F.floor(mse * 1e9 + 0.5).cast("bigint").alias("mse_e9"),
    )


def quantized_cosine_topk(
    df: DataFrame,
    query_pred,
    k: int = 5,
    levels: int = 127,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine neighbors computed ON THE INT8 CODES — the search
    path that pairs with :func:`quantize_embeddings` at scale (integer
    dot products over 4x-smaller vectors; per-vector scales cancel out
    of cosine, so ranking needs no dequantization at all).

    Same shape as the exact `similarity.cosine_topk`: bounded query set
    broadcasts, candidates never shuffle; ranking is deterministic
    (integer dots, shared sqrt, vec-id tiebreak). Returns
    ``(q_id, rank, cand_id, qcos_e6)``.
    """
    qd = quantize_embeddings(df, emb_col, id_col, levels).select(
        id_col,
        "q",
        F.aggregate(
            F.transform("q", lambda x: x.cast("long") * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("nsq"),
    )
    queries = qd.filter(query_pred).select(
        F.col(id_col).alias("q_id"),
        F.col("q").alias("qq"),
        F.col("nsq").alias("qn"),
    )
    cands = qd.select(
        F.col(id_col).alias("cand_id"),
        F.col("q").alias("cq"),
        F.col("nsq").alias("cn"),
    )
    dotq = F.aggregate(
        F.zip_with("qq", "cq", lambda x, y: x.cast("long") * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cands.join(F.broadcast(queries), F.col("cand_id") != F.col("q_id"))
        .withColumn(
            "qcos",
            dotq / F.sqrt(F.col("qn").cast("double") * F.col("cn")),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("qcos"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "rank",
            "cand_id",
            F.floor(F.col("qcos") * 1e6 + 0.5).cast("bigint").alias("qcos_e6"),
        )
    )
