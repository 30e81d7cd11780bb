"""SCD2 interval building: run collapsing, interval chaining, open tail."""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.operators.scd import scd2_intervals


def test_scd2_collapses_runs_and_chains_intervals(spark):
    rows = [
        # user 1: A A B A  -> [A:0-2), [B:2-3), [A:3-)
        (1, 0, 0, "A"), (1, 1, 1, "A"), (1, 2, 2, "B"), (1, 3, 3, "A"),
        # user 2: single state, stays open
        (2, 5, 4, "X"), (2, 9, 5, "X"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    out = sorted(
        scd2_intervals(df, "user_id", "ts", "event_type", "event_id").collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    u1 = [r for r in out if r["user_id"] == 1]
    assert [(r["event_type"], r["valid_from"], r["valid_to"], r["n_rows"]) for r in u1] == [
        ("A", 0, 2, 2), ("B", 2, 3, 1), ("A", 3, None, 1)
    ]
    u2 = [r for r in out if r["user_id"] == 2]
    assert [(r["event_type"], r["valid_from"], r["valid_to"], r["n_rows"]) for r in u2] == [
        ("X", 5, None, 2)
    ]
    # intervals tile: each valid_to equals the next valid_from per key
    for a, b in zip(u1, u1[1:]):
        assert a["valid_to"] == b["valid_from"]


def test_scd2_single_exchange_plan(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        scd2_intervals(ev, "user_id", "ts", "event_type", "event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exch = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exch <= 1, plan[:800]
