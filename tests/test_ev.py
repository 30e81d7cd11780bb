"""EV / variance / Kelly battery vs hand-computed closed forms
(reference ``Sports-Pipeline-V2/ev_calculator.py:16-66``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.ev import (
    enrich_dataframe,
)


def _expected(american, p):
    dec = american / 100 + 1 if american > 0 else 100 / -american + 1
    b = dec - 1
    ev = p * b - (1 - p)
    var = p * (b - ev) ** 2 + (1 - p) * (-1 - ev) ** 2
    ev_adj = ev - 0.5 * var
    full = ((b * p) - (1 - p)) / b if b > 0 else 0.0
    kelly = min(max(0.0, full) * 0.5, 0.05)
    return ev, var, ev_adj, kelly


@pytest.mark.parametrize(
    "american,true_prob",
    [(120.0, 0.5), (-140.0, 0.62), (100.0, 0.5), (-500.0, 0.9), (250.0, 0.2)],
)
def test_enrich_matches_closed_form(spark, american, true_prob):
    df = spark.createDataFrame(
        [(american, true_prob, 1.0 / (american / 100 + 1 if american > 0 else 100 / -american + 1))],
        "odds_american double, true_prob double, implied_prob double",
    )
    row = enrich_dataframe(df).collect()[0]
    ev, var, ev_adj, kelly = _expected(american, true_prob)
    assert row["ev"] == pytest.approx(ev)
    assert row["variance"] == pytest.approx(var)
    assert row["ev_adj"] == pytest.approx(ev_adj)
    assert row["kelly_fraction"] == pytest.approx(kelly)
    assert row["bet_flag"] == (ev >= 0.02)


def test_true_prob_null_backfills_implied(spark):
    df = spark.createDataFrame(
        [(120.0, None, 0.45)],
        "odds_american double, true_prob double, implied_prob double",
    )
    row = enrich_dataframe(df).collect()[0]
    assert row["true_prob"] == pytest.approx(0.45)
    ev, *_ = _expected(120.0, 0.45)
    assert row["ev"] == pytest.approx(ev)


def test_kelly_cap_and_floor(spark):
    # huge edge -> capped at 0.05; negative edge -> floored at 0
    df = spark.createDataFrame(
        [(200.0, 0.9, 0.9), (200.0, 0.1, 0.1)],
        "odds_american double, true_prob double, implied_prob double",
    )
    rows = {r["true_prob"]: r for r in enrich_dataframe(df).collect()}
    assert rows[0.9]["kelly_fraction"] == pytest.approx(0.05)
    assert rows[0.1]["kelly_fraction"] == pytest.approx(0.0)
