"""Table profiling — ANALYZE-style per-column statistics: row count,
null count, distinct count, min/max. The stats that feed CBO join
ordering, broadcast decisions, and data-quality monitors.

Two physical strategies, measured at sf0.1:

- ``exact=True``: one column-pruned groupBy per column (distinct values
  shuffle with map-side combine, stats fold from the grouped keys).
  2.5x faster than the single-pass multi-``count(distinct)`` form
  (0.5s vs 1.25s over orders×5 cols) because Spark compiles
  multi-distinct through an Expand that amplifies the input by the
  number of distinct aggs. Shuffle volume is bounded by per-column NDV.
- ``exact=False``: ONE ordinary map-side-combined aggregation with HLL
  ``approx_count_distinct`` — the 100 TB path; no Expand, no NDV-sized
  shuffles (rows-only comparable, like the HLL battery entry).

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
    if exact:
        parts = []
        for c in df.columns:
            grouped = df.select(c).groupBy(c).agg(F.count("*").alias("__cnt"))
            parts.append(
                grouped.agg(
                    F.lit(c).alias("col_name"),
                    F.sum("__cnt").cast("bigint").alias("n_rows"),
                    F.coalesce(
                        F.sum(F.when(F.col(c).isNull(), F.col("__cnt"))),
                        F.lit(0),
                    )
                    .cast("bigint")
                    .alias("n_nulls"),
                    F.count(F.when(F.col(c).isNotNull(), 1))
                    .cast("bigint")
                    .alias("ndv"),
                    F.min(c).cast("string").alias("min_str"),
                    F.max(c).cast("string").alias("max_str"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    aggs = [F.count("*").alias("__n")]
    for c in df.columns:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.approx_count_distinct(c).alias(f"__ndv_{c}"),
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
