"""Frequency analysis: iceberg / heavy-hitter queries — "which items
exceed s% of their group" — the shape behind hot-key detection (feeding
the skew tools), vocabulary pruning, and bot/outlier surfacing.

Exact form: two cascaded aggregations. The first (group, item) count
shuffles with map-side combine; the per-group totals then come from a
window over the ALREADY-AGGREGATED counts — rows at that point are
(distinct items × groups), typically orders of magnitude smaller than
the input, so the second exchange is cheap. No driver-side state.

(The sketch companion at unbounded item cardinality is Misra-Gries /
count-min; like HLL those are engine-specific and would be rows-only —
the exact iceberg form is the oracle-able one.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    threshold: float = 0.01,
) -> DataFrame:
    """All (group, item) pairs where the item covers ≥ ``threshold`` of
    the group's rows. Output: group cols, item, ``cnt``, ``n_group``
    (share is derivable; exact integers only, so results hash-match any
    engine)."""
    counts = df.groupBy(*group_cols, item_col).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = Window.partitionBy(*group_cols)
    return (
        counts.withColumn("n_group", F.sum("cnt").over(w).cast("bigint"))
        .filter(F.col("cnt") >= F.col("n_group") * F.lit(threshold))
    )
