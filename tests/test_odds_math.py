"""Unit tests for the scalar odds math (SURVEY §2.3), including the
reference's quirks that must be preserved verbatim (SURVEY §4.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.functions.odds_math import (
    american_to_decimal,
    coerce_numeric,
    decimal_to_american,
    to_decimal_odds,
)


def _eval(spark, col, values, in_type="double"):
    df = spark.createDataFrame([(v,) for v in values], f"x {in_type}")
    return [r["y"] for r in df.select(col(F.col("x")).alias("y")).collect()]


def test_american_to_decimal(spark):
    out = _eval(spark, american_to_decimal, [120.0, -140.0, -110.0, 100.0])
    assert out[0] == pytest.approx(2.2)
    assert out[1] == pytest.approx(1 + 100 / 140)
    assert out[2] == pytest.approx(1 + 100 / 110)
    assert out[3] == pytest.approx(2.0)


def test_decimal_to_american_branches(spark):
    out = _eval(spark, decimal_to_american, [2.2, 2.0, 1.5, 1.0, 0.5, None])
    assert out[0] == pytest.approx(120.0)  # d>=2 -> (d-1)*100
    assert out[1] == pytest.approx(100.0)
    assert out[2] == pytest.approx(-200.0)  # 1<d<2 -> -100/(d-1)
    assert out[3] is None  # d<=1 -> null
    assert out[4] is None
    assert out[5] is None


def test_round_trip_american_decimal(spark):
    """decimal -> american -> decimal is identity for d >= 2 and 1<d<2."""
    vals = [1.2, 1.5, 1.91, 2.0, 2.5, 3.75, 11.0]
    col = lambda c: american_to_decimal(decimal_to_american(c))
    out = _eval(spark, col, vals)
    for v, o in zip(vals, out):
        assert o == pytest.approx(v, rel=1e-3)


def test_format_heuristic_quirks(spark):
    """SURVEY §4.3-1: per-row heuristic; decimal >= 100 is (deliberately)
    misread as American; 0 and negatives take the American branch."""
    out = _eval(spark, to_decimal_odds, [1.9, 99.0, 100.0, -110.0, 150.0])
    assert out[0] == pytest.approx(1.9)  # decimal passthrough
    assert out[1] == pytest.approx(99.0)  # abs < 100 -> decimal
    assert out[2] == pytest.approx(2.0)  # quirk: 100 -> "American" +100
    assert out[3] == pytest.approx(1 + 100 / 110)
    assert out[4] == pytest.approx(2.5)  # quirk: 150 -> American


def test_coerce_numeric(spark):
    out = _eval(spark, coerce_numeric, ["+120", "-140", "1.95", "junk", None], "string")
    assert out[0] == pytest.approx(120.0)
    assert out[1] == pytest.approx(-140.0)
    assert out[2] == pytest.approx(1.95)
    assert out[3] is None
    assert out[4] is None
