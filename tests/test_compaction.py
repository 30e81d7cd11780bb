"""Canonical-table compaction: many small appended files collapse to one
per date partition with identical contents."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.sinks import compact_canonical, update_canonical_table


def test_compact_canonical(spark, tmp_path):
    path = str(tmp_path / "canonical.parquet")
    batch = spark.createDataFrame(
        [("2026-08-13T10:00:00", "g1", 2.0), ("2026-08-14T10:00:00", "g2", 1.9)],
        "timestamp string, game_id string, price double",
    )
    for _ in range(5):  # 5 appends -> many small files across 2 partitions
        update_canonical_table(batch, path)
    files_before = len(list(Path(path).rglob("*.parquet")))
    before = spark.read.parquet(path).orderBy("timestamp", "game_id").collect()

    n = compact_canonical(spark, path)
    assert n == 10
    files_after = len(list(Path(path).rglob("*.parquet")))
    assert files_after < files_before
    assert files_after <= 2  # one file per snapshot_date partition
    after = spark.read.parquet(path).orderBy("timestamp", "game_id").collect()
    assert [r.asDict() for r in before] == [r.asDict() for r in after]
    assert not list(Path(path).parent.glob("*.pre_compact"))  # swap cleaned up
