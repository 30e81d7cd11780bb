"""Table profiling — ANALYZE-style per-column statistics in one pass:
row count, null count, distinct count, min/max. The stats that feed CBO
join ordering, broadcast decisions, and data-quality monitors.

One aggregation over the table produces every column's stats, then a
narrow explode reshapes the single row into one row per column.
``exact=True`` uses real ``count(distinct)`` per column — Spark compiles
the multi-distinct agg through an Expand (input amplified by the number
of distinct aggs), acceptable for profiling runs and required for the
hash-checked oracle. At 100 TB run ``exact=False``: HLL
``approx_count_distinct`` keeps the pass to one ordinary map-side-
combined aggregation (rows-only comparable, like the HLL battery entry).

Min/max serialize via CAST-to-string, which the profiled column types
(ints, doubles, dates, strings) format identically across engines.
No reference counterpart; infrastructure for the join/layout family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, exact: bool = True) -> DataFrame:
    """One row per column: ``(col_name, n_rows, n_nulls, ndv,
    min_str, max_str)``."""
    ndv = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count("*").alias("__n")]
    for c in df.columns:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            ndv(c).alias(f"__ndv_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("bigint").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).cast("bigint").alias("n_nulls"),
                F.col(f"__ndv_{c}").cast("bigint").alias("ndv"),
                F.col(f"__min_{c}").alias("min_str"),
                F.col(f"__max_{c}").alias("max_str"),
            )
            for c in df.columns
        ]
    )
    return one.select(F.explode(per_col).alias("s")).select("s.*")
