"""Table profiler: null accounting, NDV, approx mode."""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.operators.profile import profile_table


def test_profile_counts_nulls_and_ndv(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        ["x", "y"],
    )
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert out["x"]["n_rows"] == 4 and out["x"]["n_nulls"] == 1 and out["x"]["ndv"] == 3
    assert out["y"]["n_nulls"] == 1 and out["y"]["ndv"] == 2
    assert out["x"]["min_str"] == "1" and out["x"]["max_str"] == "3"


def test_profile_approx_mode_tracks_exact(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_type"
    )
    exact = {r["col_name"]: r["ndv"] for r in profile_table(ev, exact=True).collect()}
    approx = {r["col_name"]: r["ndv"] for r in profile_table(ev, exact=False).collect()}
    for c in exact:
        assert abs(approx[c] - exact[c]) <= max(2, 0.1 * exact[c]), c
