"""E2E test for the one-call app wrappers: the golden two-game fixture
must reproduce the Streamlit app's summary table exactly (reference
web/app.py:36-71 run by hand over the same fixture).
"""

from __future__ import annotations

import sports_data_integration_and_forecasting_pipeline_spark as eng
from pyspark.sql import functions as F


def test_run_app_pipeline_golden(spark):
    tables = eng.run_app_pipeline(spark)  # bundled sample, h2h
    # game_id is the synthetic home_vs_away_time concat (C13, the
    # preserved reference quirk) -> key on (home_team, outcome)
    summary = {
        (r["home_team"], r["outcome"]): r
        for r in tables["summary"].collect()
    }
    assert len(summary) == 4  # 2 games x 2 outcomes

    lakers = summary[("Los Angeles Lakers", "Los Angeles Lakers")]
    heat = summary[("Los Angeles Lakers", "Miami Heat")]
    assert (lakers["best_price"], lakers["best_bookmaker"]) == (1.95, "BookA")
    assert (heat["best_price"], heat["best_bookmaker"]) == (2.2, "BookA")
    # golden arb edge: 1 - (1/1.95 + 1/2.2) = 3.26% on both game rows
    assert lakers["arbitrage_margin_pct"] == 3.26
    assert heat["arbitrage_margin_pct"] == 3.26
    assert lakers["home_team"] == "Los Angeles Lakers"
    assert lakers["away_team"] == "Miami Heat"

    # the second game's books are efficient -> NULL margin, rows present
    assert summary[("Denver Nuggets", "Denver Nuggets")]["arbitrage_margin_pct"] is None
    assert summary[("Denver Nuggets", "Phoenix Suns")]["arbitrage_margin_pct"] is None

    arb = tables["arbitrage"].collect()
    assert len(arb) == 1
    assert arb[0]["home_team"] == "Los Angeles Lakers"
    assert arb[0]["arbitrage_margin_pct"] == 3.26

    # cleaned table is the oracle-checked clean_odds output (6 h2h rows:
    # game_001 has two books for one side)
    assert tables["cleaned"].count() == 6


def test_load_data_live_falls_back_without_key(spark):
    # use_live without an api key hits the reference's ValueError contract
    # and falls back to the bundled sample (web/app.py:24-29)
    cleaned = eng.load_data(spark, use_live=True, api_key=None)
    assert cleaned.count() == 6


def test_read_log_tail(tmp_path):
    from sports_data_integration_and_forecasting_pipeline_spark.app import read_log_tail

    assert read_log_tail(tmp_path / "missing.log") == ""
    p = tmp_path / "app.log"
    p.write_text("".join(f"line {i}\n" for i in range(10)))
    assert read_log_tail(p) == p.read_text()
    assert read_log_tail(p, max_lines=3) == "line 7\nline 8\nline 9\n"


def test_observed_pipeline_metrics_single_pass(spark):
    """df.observe quality metrics arrive as a side effect of the summary
    action — values must equal direct aggregation over the cleaned rows."""
    from sports_data_integration_and_forecasting_pipeline_spark.app import load_sample_games, observed_pipeline
    from sports_data_integration_and_forecasting_pipeline_spark.operators.odds import clean_odds

    cleaned = clean_odds(load_sample_games(spark), "h2h")
    summary, obs = observed_pipeline(cleaned)
    summary.collect()  # any action materializes the metrics
    got = obs.get
    expected = cleaned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("price").isNull(), 1).otherwise(0)).alias(
            "null_prices"
        ),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
    ).collect()[0]
    assert got["n_rows"] == expected["n_rows"] == 6
    assert got["null_prices"] == expected["null_prices"] == 0
    assert got["min_price"] == expected["min_price"]
    assert got["max_price"] == expected["max_price"]


def test_render_dashboard_text_golden(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.app import render_dashboard_text

    text = render_dashboard_text(spark=spark)
    assert "== Best odds summary ==" in text
    assert "== Arbitrage opportunities ==" in text
    # the golden fixture's arb game and margin appear in the render
    assert "Los Angeles Lakers" in text
    assert "3.26" in text


def test_streamlit_app_import_gated(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.app import streamlit_app
    import pytest

    # streamlit isn't installed here: the adapter must fail with the
    # pointed message, not an opaque ModuleNotFoundError mid-render
    with pytest.raises(ImportError, match="render_dashboard_text"):
        streamlit_app(spark)


def test_ipywidgets_dashboard_import_gated(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.app import ipywidgets_dashboard
    import pytest

    with pytest.raises(ImportError, match="render_dashboard_text"):
        ipywidgets_dashboard(spark)


def test_prediction_explorer_text(spark):
    # reference src/interface.py parity: entity filter + probability bars
    from sports_data_integration_and_forecasting_pipeline_spark.app import render_prediction_explorer_text

    pred = spark.createDataFrame(
        [("curry", 0.61), ("curry", 0.25), ("lebron", 0.50)],
        "player string, prob double",
    )
    text = render_prediction_explorer_text(pred)
    # default entity = first distinct in sorted order
    assert "== player: curry (2 available) ==" in text
    assert "0.610" in text and "0.250" in text
    assert "lebron" not in text.split("== prob ==")[1]
    # explicit entity selection filters to that entity only
    text2 = render_prediction_explorer_text(pred, entity="lebron")
    assert "lebron" in text2 and "curry" not in text2
    # 0.5 -> 20 of 40 bar columns
    assert "#" * 20 + " 0.500" in text2


def test_prediction_explorer_text_empty_and_missing(spark):
    # r6 ADVICE: empty input short-circuits instead of rendering a
    # "player: None (0 available)" header over a filter on NULL, and a
    # caller-supplied entity absent from the data is flagged
    from sports_data_integration_and_forecasting_pipeline_spark.app import render_prediction_explorer_text

    empty = spark.createDataFrame([], "player string, prob double")
    assert render_prediction_explorer_text(empty) == "(no player entities)"

    pred = spark.createDataFrame(
        [("curry", 0.61)], "player string, prob double"
    )
    text = render_prediction_explorer_text(pred, entity="nobody")
    assert "[not found in data]" in text
    assert "(no rows)" in text


def test_streamlit_prediction_explorer_import_gated(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.app import streamlit_prediction_explorer
    import pytest

    pred = spark.createDataFrame([("a", 0.5)], "player string, prob double")
    with pytest.raises(ImportError, match="render_prediction_explorer_text"):
        streamlit_prediction_explorer(pred)
