"""As-of join unit tests on hand-computed series, plus a pandas
merge_asof differential on the real events table."""

from __future__ import annotations

import pandas as pd

from sports_data_integration_and_forecasting_pipeline_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_backward(spark):
    left = _mk(
        spark,
        [("a", 5, "l1"), ("a", 10, "l2"), ("a", 2, "l0"), ("b", 7, "l3")],
        "k string, ts long, tag string",
    )
    right = _mk(
        spark,
        [("a", 3, 30.0), ("a", 9, 90.0), ("b", 8, 80.0)],
        "k string, ts long, mark double",
    )
    got = {
        r["tag"]: (r["matched_ts"], r["matched_mark"])
        for r in asof_join(left, right, on="k").collect()
    }
    assert got == {
        "l0": (None, None),  # no mark at or before ts=2
        "l1": (3, 30.0),
        "l2": (9, 90.0),
        "l3": (None, None),  # b's only mark is at 8 > 7
    }


def test_asof_equal_ts_matches(spark):
    left = _mk(spark, [("a", 5, "l")], "k string, ts long, tag string")
    right = _mk(spark, [("a", 5, 1.5)], "k string, ts long, mark double")
    rows = asof_join(left, right, on="k").collect()
    assert (rows[0]["matched_ts"], rows[0]["matched_mark"]) == (5, 1.5)


def test_asof_tolerance(spark):
    left = _mk(spark, [("a", 100, "l")], "k string, ts long, tag string")
    right = _mk(spark, [("a", 40, 4.0)], "k string, ts long, mark double")
    ok = asof_join(left, right, on="k", tolerance=60).collect()
    assert ok[0]["matched_mark"] == 4.0  # 100 - 40 == tolerance -> kept
    dropped = asof_join(left, right, on="k", tolerance=59).collect()
    assert dropped[0]["matched_mark"] is None


def test_asof_differential_vs_pandas(spark):
    """Full differential on real data: Spark as-of == pandas merge_asof."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "ts", "value"
    )
    marks = ev.filter((ev.event_id % 5) == 0).select(
        "user_id", "ts", ev.value.alias("mark_value")
    )
    got = (
        asof_join(ev, marks, on="user_id")
        .select("event_id", "matched_ts", "matched_mark_value")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    lp = ev.toPandas().sort_values("ts")
    rp = marks.toPandas().sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    exp = (
        exp.rename(columns={"ts": "matched_dummy"})
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got["matched_mark_value"].fillna(-1)) == list(
        exp["mark_value"].fillna(-1)
    )
