"""Data-layout optimization — Z-order (Morton) clustering and min/max
file-pruning statistics.

Why it matters at 100 TB: engines skip files using per-file min/max
column stats (parquet row groups, Delta/Iceberg file stats). A table
sorted by ONE column prunes range predicates on that column only; a
Z-ORDER sort interleaves the bits of several columns so files stay
tight in EVERY interleaved dimension — the same 2-D box touches far
fewer files. This module computes the Morton key (pure integer
arithmetic, engine-portable — the battery entry hash-matches DuckDB,
pruning counts included) and simulates the file layout + stats-based
pruning so layouts can be compared quantitatively.

File assignment here uses a global ``ntile`` — exact and fine for
simulation; a production writer would ``repartitionByRange`` on the
z-key (sampled range bounds, no global sort) and write one file per
range partition. The pruning MODEL (overlap of per-file min/max with
the query box) is exactly what the scan planner does either way.

No reference counterpart; infrastructure alongside `operators/skew.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zorder_key_expr(d1: str, d2: str, bits: int = 12) -> str:
    """Spark SQL expression interleaving the low ``bits`` bits of two
    non-negative int columns: d1 takes even bit positions, d2 odd."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({d1}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({d2}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def zorder_key_sql(d1: str, d2: str, bits: int = 12) -> str:
    """DuckDB twin of :func:`zorder_key_expr` (same arithmetic, operator
    syntax)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({d1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({d2} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def layout_scan_stats(
    df: DataFrame,
    sort_cols: list[Column],
    d1: str,
    d2: str,
    boxes: dict[str, tuple[int, int, int, int]],
    n_files: int,
    layout_name: str,
) -> DataFrame:
    """Simulate writing ``df`` as ``n_files`` files in ``sort_cols``
    order and planning each box query ``d1 ∈ [lo1,hi1] ∧ d2 ∈
    [lo2,hi2]`` against per-file min/max stats.

    One row per box: ``(layout, query, n_files, files_scanned,
    files_matching, rows_matched)`` — ``files_scanned`` is what
    stats-based pruning cannot skip (min/max box overlap);
    ``files_matching`` actually contain hits (the floor any pruning
    could reach). One global sort + ONE per-file agg serve every box.
    """
    filed = df.withColumn(
        "__file", F.ntile(n_files).over(Window.orderBy(*sort_cols))
    )
    hit_aggs = [
        F.count_if(
            (F.col(d1) >= lo1) & (F.col(d1) <= hi1)
            & (F.col(d2) >= lo2) & (F.col(d2) <= hi2)
        ).alias(f"hits_{q}")
        for q, (lo1, hi1, lo2, hi2) in boxes.items()
    ]
    stats = filed.groupBy("__file").agg(
        F.min(d1).alias("min1"),
        F.max(d1).alias("max1"),
        F.min(d2).alias("min2"),
        F.max(d2).alias("max2"),
        *hit_aggs,
    )
    out = None
    for q, (lo1, hi1, lo2, hi2) in boxes.items():
        overlap = (
            (F.col("max1") >= lo1) & (F.col("min1") <= hi1)
            & (F.col("max2") >= lo2) & (F.col("min2") <= hi2)
        )
        row = stats.groupBy().agg(
            F.lit(layout_name).alias("layout"),
            F.lit(q).alias("query"),
            F.count("*").cast("bigint").alias("n_files"),
            F.count_if(overlap).cast("bigint").alias("files_scanned"),
            F.count_if(F.col(f"hits_{q}") > 0).cast("bigint").alias("files_matching"),
            F.sum(f"hits_{q}").cast("bigint").alias("rows_matched"),
        )
        out = row if out is None else out.unionByName(row)
    return out
