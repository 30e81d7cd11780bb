"""Backtest-as-aggregation and accuracy vs the reference fold semantics
(``src/evaluation.py:10-39``; order-independence per SURVEY §2.4 A12)."""

from __future__ import annotations

import pytest

from sports_data_integration_and_forecasting_pipeline_spark.operators.evaluation import (
    backtest,
    evaluate_accuracy,
    label_bets,
)


def _reference_backtest(predictions, market_lines, threshold=0.55):
    bets, bankroll, stake = [], 1000, 10
    for pred, line in zip(predictions, market_lines):
        if pred > line and pred > threshold:
            bankroll += stake
            bets.append("win")
        elif pred < line and (1 - pred) > threshold:
            bankroll -= stake
            bets.append("loss")
        else:
            bets.append("pass")
    return bankroll, (bankroll - 1000) / 1000, bets


CASES = [
    (0.70, 0.60),  # win: pred>line, pred>0.55
    (0.30, 0.50),  # loss: pred<line, 1-pred>0.55
    (0.50, 0.45),  # pass: pred>line but pred<=0.55
    (0.52, 0.60),  # pass: pred<line but 1-pred<=0.55
    (0.56, 0.56),  # pass: equal
    (0.90, 0.10),  # win
    (0.05, 0.95),  # loss
]


def test_backtest_matches_reference_fold(spark):
    preds = [c[0] for c in CASES]
    lines = [c[1] for c in CASES]
    exp_bankroll, exp_roi, exp_bets = _reference_backtest(preds, lines)

    df = spark.createDataFrame(CASES, "prediction double, market_line double")
    row = backtest(df).collect()[0]
    assert row["final_bankroll"] == pytest.approx(exp_bankroll)
    assert row["roi"] == pytest.approx(exp_roi)
    assert row["wins"] == exp_bets.count("win")
    assert row["losses"] == exp_bets.count("loss")
    assert row["passes"] == exp_bets.count("pass")

    labels = (
        label_bets(df)
        .orderBy("prediction")
        .select("prediction", "bet")
        .collect()
    )
    by_pred = {r["prediction"]: r["bet"] for r in labels}
    for (pred, line), bet in zip(CASES, exp_bets):
        assert by_pred[pred] == bet


def test_evaluate_accuracy(spark):
    rows = [(0.9, 1), (0.6, 0), (0.2, 0), (0.4, 1)]
    df = spark.createDataFrame(rows, "prediction double, outcome int")
    acc = evaluate_accuracy(df).collect()[0]["accuracy"]
    # reference: mean((pred>=0.5)==outcome) = [1,0,1,0] -> 0.5
    assert acc == pytest.approx(0.5)
