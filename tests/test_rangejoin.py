"""Binned interval-overlap join: hand-computed cases + naive-join
differential on real session intervals."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.rangejoin import (
    interval_overlap_join,
)


def test_overlap_basic(spark):
    left = spark.createDataFrame(
        [(1, 0, 10), (2, 20, 30)], "id long, s long, e long"
    )
    right = spark.createDataFrame(
        [(10, 5, 25), (11, 31, 40)], "id long, s long, e long"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(left, right, bin_width=4).collect()
    }
    # 10 overlaps both left intervals; 11 overlaps neither
    assert got == {(1, 10), (2, 10)}


def test_touching_endpoints_overlap(spark):
    # closed intervals: touching at a point counts (like the SQL BETWEEN form)
    left = spark.createDataFrame([(1, 0, 10)], "id long, s long, e long")
    right = spark.createDataFrame([(2, 10, 20)], "id long, s long, e long")
    got = interval_overlap_join(left, right, bin_width=7).collect()
    assert len(got) == 1


def test_no_duplicate_pairs_across_bins(spark):
    # intervals spanning many shared bins must emit exactly one pair row
    left = spark.createDataFrame([(1, 0, 100)], "id long, s long, e long")
    right = spark.createDataFrame([(2, 0, 100)], "id long, s long, e long")
    got = interval_overlap_join(left, right, bin_width=10).collect()
    assert len(got) == 1


def test_differential_vs_naive_join(spark):
    """Binned join == naive range-predicate join on real session data."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.expr("INTERVAL 30 MINUTES")
    lagged = F.lag("ts").over(w)
    ts_s = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col("ts"),
    )
    ts_s = ((ts_s - ts_s % F.lit(1_000_000)) / F.lit(1_000_000)).cast("long")
    numbered = ev.select(
        "user_id",
        ts_s.alias("ts_s"),
        F.sum(
            F.when(lagged.isNull() | ((F.col("ts") - lagged) > gap), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"),
    )
    sessions = numbered.groupBy("user_id", "sid").agg(
        F.min("ts_s").alias("s"), F.max("ts_s").alias("e")
    )
    binned = {
        (r["user_id_a"], r["sid_a"], r["user_id_b"], r["sid_b"])
        for r in interval_overlap_join(
            sessions, sessions, bin_width=3600,
            extra_pred=lambda d: d["user_id_a"] < d["user_id_b"],
        ).collect()
    }
    a = sessions.select(
        *[F.col(c).alias(f"{c}_a") for c in sessions.columns]
    )
    b = sessions.select(
        *[F.col(c).alias(f"{c}_b") for c in sessions.columns]
    )
    naive = {
        (r["user_id_a"], r["sid_a"], r["user_id_b"], r["sid_b"])
        for r in a.join(
            b,
            (F.col("user_id_a") < F.col("user_id_b"))
            & (F.col("s_a") <= F.col("e_b"))
            & (F.col("s_b") <= F.col("e_a")),
        ).collect()
    }
    assert binned == naive and binned
