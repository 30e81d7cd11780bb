"""Sinks (SURVEY §2.1 S5-S7): snapshot, canonical append, reports.

The reference's canonical table is read-whole + concat + rewrite-whole CSV
(``src/ingestion.py:132-142``) — O(table) per append. Parquet
``mode("append")`` reaches the same table contents with O(batch) work and
is safe for concurrent readers; partitioning by snapshot date keeps 100 TB
of history prunable.
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_snapshot(
    df: DataFrame, markets: str, out_dir: str | Path = "data", fmt: str = "parquet"
) -> str:
    """S5 timestamped snapshot write (reference ``src/ingestion.py:121-130``
    wrote ``odds_{markets}_{ts}.csv``); parquet by default, CSV for parity."""
    stamp = time.strftime("%Y%m%d_%H%M%S")
    path = str(Path(out_dir) / f"odds_{markets}_{stamp}.{fmt}")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    else:
        writer.parquet(path)
    return path


def update_canonical_table(
    df: DataFrame, canonical_path: str = "data/odds_canonical.parquet"
) -> str:
    """S6 canonical append (reference ``src/ingestion.py:132-142``).

    Appends the batch partitioned by snapshot date so historical replays
    prune by date; the reference's read+concat+rewrite becomes a pure
    append.
    """
    (
        df.withColumn("snapshot_date", F.to_date(F.col("timestamp")))
        .write.mode("append")
        .partitionBy("snapshot_date")
        .parquet(canonical_path)
    )
    return canonical_path


def compact_canonical(
    spark,
    canonical_path: str,
    target_files_per_partition: int = 1,
    partition_col: str = "snapshot_date",
) -> int:
    """Small-file compaction for the canonical append table.

    Every streaming/batch append adds files; at 100 TB the canonical
    history degrades into millions of tiny parquet files whose open/footer
    overhead dominates scans. Compaction rewrites each date partition into
    ``target_files_per_partition`` right-sized files and swaps the result
    in (write-aside + atomic rename — readers mid-swap see the old or new
    complete table, never a mix). Returns the number of rows compacted.
    """
    import shutil
    import uuid
    from pathlib import Path as P

    src = P(canonical_path)
    tmp = src.with_name(f"{src.name}.compacting.{uuid.uuid4().hex[:8]}")
    df = spark.read.parquet(str(src))
    n = df.count()
    (
        df.repartition(target_files_per_partition, partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(str(tmp))
    )
    bak = src.with_name(f"{src.name}.pre_compact")
    src.rename(bak)
    tmp.rename(src)
    shutil.rmtree(bak)
    return n


def export_report(df: DataFrame, path: str, fmt: str = "csv") -> str:
    """S7 report export (reference ``widgets_ui.py:119-121``, notebook
    cell 6)."""
    writer = df.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    else:
        writer.parquet(path)
    return path
