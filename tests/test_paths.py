"""Path funnel: ordering, gap-tolerant subsequence semantics, token
boundaries."""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.operators.paths import (
    funnel_pattern,
    path_funnel,
    user_event_paths,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])


def test_paths_ordered_by_ts_then_tiebreak(spark):
    df = _ev(
        spark,
        [(1, 20, 1, "b"), (1, 10, 2, "a"), (1, 20, 0, "c")],
    )
    out = user_event_paths(df).collect()[0]
    assert out["path"] == "a>c>b" and out["n_events"] == 3


def test_funnel_subsequence_with_gaps(spark):
    df = _ev(
        spark,
        # user 1: full funnel with noise between stages
        [(1, t, t, e) for t, e in enumerate(["view", "error", "click", "signup", "purchase"])]
        # user 2: purchase BEFORE click -> stage 2 never completes to 3
        + [(2, t, t, e) for t, e in enumerate(["view", "purchase", "click"])]
        # user 3: click only, no view prefix
        + [(3, 0, 0, "click")],
    )
    out = {r["user_id"]: r for r in path_funnel(df, ["view", "click", "purchase"]).collect()}
    assert out[1]["max_stage"] == 3
    assert out[2]["max_stage"] == 2 and not out[2]["stage_3"]
    assert out[3]["max_stage"] == 0 and not out[3]["stage_1"]


def test_funnel_pattern_is_token_bounded():
    import re

    # 'preview' must not satisfy a 'view' stage
    assert not re.search(funnel_pattern(["view"], 1), "preview>click")
    assert re.search(funnel_pattern(["view"], 1), "preview>view>click")
