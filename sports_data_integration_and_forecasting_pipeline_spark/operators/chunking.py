"""Document chunking — split long documents into token-bounded,
optionally overlapping windows (the pre-tokenization step of sequence
packing for LLM training, and the unit of retrieval indexing).

Scale shape: ENTIRELY NARROW — tokenize, compute chunk starts with
integer arithmetic, explode, slice. Zero shuffles, zero Python; a 100 TB
corpus chunks at parquet-scan speed and the output stays co-partitioned
with its input (downstream per-chunk ops start shuffle-free).

Chunk layout: starts at 0, stride, 2·stride, … while start < n_tokens;
each chunk takes ``max_tokens`` tokens (the tail may be shorter).
``stride < max_tokens`` yields the standard training overlap;
``stride = max_tokens`` is disjoint packing. All integer arithmetic, so
the battery entry hash-matches DuckDB (`slice(arr, i, n)` ==
`list_slice(l, i, i+n-1)` — both 1-based, both end-clamped).

No reference counterpart; part of the corpus-curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 32,
    stride: int | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (doc, chunk): ``(id_col, *passthrough, chunk_id,
    chunk_start, chunk_tokens, chunk_fp)`` where ``chunk_fp`` is the md5
    of the chunk's whitespace-rejoined text (carry the text itself by
    swapping the fingerprint projection — fp keeps battery rows
    compact). ``passthrough`` columns (e.g. language, source) ride the
    narrow plan instead of forcing a join-back after chunking."""
    stride = stride or max_tokens
    if not 0 < stride <= max_tokens:
        raise ValueError("need 0 < stride <= max_tokens")
    extra = list(passthrough)
    toks = df.select(
        F.col(id_col),
        *extra,
        F.split(F.col(text_col), " ").alias("__toks"),
    ).withColumn("__n", F.size("__toks"))
    # n_chunks = ceil(n / stride), integer-exact in both engines
    chunks = toks.select(
        id_col,
        *extra,
        "__toks",
        F.explode(
            F.sequence(
                F.lit(0), F.expr(f"(__n + {stride - 1}) div {stride}").cast("int") - 1
            )
        ).alias("chunk_id"),
    ).withColumn("__chunk", F.slice("__toks", F.col("chunk_id") * stride + 1, max_tokens))
    return chunks.select(
        id_col,
        *extra,
        F.col("chunk_id").cast("bigint"),
        (F.col("chunk_id") * stride).cast("bigint").alias("chunk_start"),
        F.size("__chunk").cast("bigint").alias("chunk_tokens"),
        F.md5(F.array_join("__chunk", " ")).alias("chunk_fp"),
    )
