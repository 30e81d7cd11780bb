"""Benchmark decontamination — flag corpus documents that overlap a
held-out evaluation set by shared word n-grams.

The standard training-data hygiene step (cf. GPT-3 appendix C / PaLM
"contamination" analyses, public methodology): any training document
sharing >= ``min_hits`` n-grams with a benchmark document is flagged so
it can be dropped or audited before training.

Scale shape (the reason this form survives 100 TB):

- The BENCHMARK side is small by construction (eval sets are thousands
  of docs, not billions) — its distinct shingle-hash set is built once
  and **broadcast**, so the corpus never shuffles to meet it.
- The CORPUS side is one narrow projection (tokenize -> shingle -> h60)
  + explode, a broadcast left join (still narrow), and ONE hash
  aggregation on doc_id with map-side partial combine. Scan-bound.
- Shingle identity is the shared 60-bit md5 hash (`dedup.h60`), so the
  join moves 8-byte longs and the whole computation is reproducible
  bit-for-bit in any engine with md5 — the battery entry hash-matches
  DuckDB.

No reference counterpart (the reference has no corpus tooling); this is
part of the LLM-data-pipeline family alongside `operators/dedup.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import h60, shingle_rows


def _doc_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    unique_id: bool = True,
) -> DataFrame:
    """(id, sh) rows: each doc's DISTINCT word-n-gram 60-bit hashes.

    r8: codegen lead-window enumeration (`shingle_rows`) — the
    transform/array_distinct lambda form is interpreted per element
    (SCALING.md round-8 finding). The distinct reuses the doc-granular
    partitioning the callers' ensure_parallelism plants."""
    return (
        shingle_rows(
            df, text_col=text_col, id_col=id_col, n=n, unique_id=unique_id
        )
        .select(F.col(id_col), h60(F.col("shingle")).alias("sh"))
        .distinct()
    )


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 1,
    unique_id: bool = True,
) -> DataFrame:
    """Per corpus doc: how many of its distinct word-``n``-grams appear
    anywhere in ``benchmark``, and whether that crosses ``min_hits``.

    Returns ``(id_col, n_shingles, n_hit, contamination, contaminated)``
    where ``contamination = n_hit / n_shingles`` (exact int/int double
    division — engine-portable without rounding).

    With the default ``unique_id=True``, ``id_col`` must uniquely key the
    rows of BOTH inputs (the lead-window shingle enumerator stitches
    n-grams across rows sharing an id); pass ``unique_id=False`` for
    non-PK ids — rows sharing an id are then audited as one document.
    """
    bench_sh = (
        _doc_shingles(benchmark, text_col, id_col, n, unique_id=unique_id)
        .select("sh")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    from sports_data_integration_and_forecasting_pipeline_spark.operators.parallelism import ensure_parallelism

    # spread keyed by doc id: shingling runs on every core, the broadcast
    # join preserves the partitioning, and the per-doc agg reuses it — one
    # exchange total
    joined = _doc_shingles(
        ensure_parallelism(corpus, id_col), text_col, id_col, n,
        unique_id=unique_id,
    ).join(F.broadcast(bench_sh), "sh", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.count("__hit").cast("bigint").alias("n_hit"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_hit",
            (F.col("n_hit") / F.col("n_shingles")).alias("contamination"),
            (F.col("n_hit") >= F.lit(min_hits)).alias("contaminated"),
        )
    )
