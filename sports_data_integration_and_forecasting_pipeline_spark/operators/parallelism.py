"""Input-width guard for CPU-heavy narrow stages.

A Spark scan's task count comes from file splits
(``spark.sql.files.maxPartitionBytes``); a small parquet table — one
row-group, a few MB — arrives as ONE partition, so everything before the
first shuffle (tokenize, md5 shingling, gram explosion) runs on one core
no matter how many the session has. That serial prefix dominated the
round-2 bench profile of every documents-table operator.

At 100 TB the same scans arrive as thousands of splits and need no help —
so the guard below only ever *widens*, never coalesces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(
    df: DataFrame,
    *key_cols: str,
    min_partitions: int | None = None,
) -> DataFrame:
    """``repartition`` up to the session's default parallelism when (and
    only when) the input is narrower. The repartition moves raw input
    bytes once — worth it exactly when the per-row work downstream
    (hashing, shingling) outweighs one extra pass over the data, which is
    why only the signature/index builders call this, not cheap projections.

    Pass ``key_cols`` when a ``groupBy``/window on those columns follows:
    hash-partitioning by the key satisfies the downstream distribution
    requirement, so Catalyst plans ONE exchange for spread + aggregation
    instead of round-robin + hash (measured 2.7× on the MinHash signature
    stage). Without keys the spread is round-robin; placement is not
    deterministic across runs either way, so callers must be
    order-independent (every battery aggregate is, by design)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *[df[c] for c in key_cols])
    return df.repartition(target)
