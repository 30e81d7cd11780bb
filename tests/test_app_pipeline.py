"""E2E test for the one-call app wrappers: the golden two-game fixture
must reproduce the Streamlit app's summary table exactly (reference
web/app.py:36-71 run by hand over the same fixture).
"""

from __future__ import annotations

import sports_data_integration_and_forecasting_pipeline_spark as eng


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
