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


def test_scd2_null_attr_breaks_and_forms_islands(spark):
    """Null-safe change flag (ADVICE r2): a non-null -> NULL transition must
    START a new island (not be absorbed into the previous one), NULL -> NULL
    must continue an island, and an all-NULL run reports attr NULL."""
    rows = [
        # user 1: A A NULL NULL B  -> [A:0-2), [NULL:2-4), [B:4-)
        (1, 0, 0, "A"), (1, 1, 1, "A"), (1, 2, 2, None), (1, 3, 3, None),
        (1, 4, 4, "B"),
        # user 2: starts NULL -> X   -> [NULL:0-1), [X:1-)
        (2, 0, 5, None), (2, 1, 6, "X"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts int, event_id int, event_type string"
    )
    out = sorted(
        scd2_intervals(df, "user_id", "ts", "event_type", "event_id").collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    got = [
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"], r["n_rows"])
        for r in out
    ]
    assert got == [
        (1, "A", 0, 2, 2),
        (1, None, 2, 4, 2),
        (1, "B", 4, None, 1),
        (2, None, 0, 1, 1),
        (2, "X", 1, None, 1),
    ]


def test_scd2_single_exchange_plan(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        scd2_intervals(ev, "user_id", "ts", "event_type", "event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exch = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exch <= 1, plan[:800]
