"""Backtest + accuracy as aggregations (SURVEY §2.4 A11-A12).

The reference's backtest is a sequential Python fold over (prediction,
line) pairs (``src/evaluation.py:10-31``) — but with a constant stake the
fold is order-independent, so it is exactly one labeled projection plus one
global aggregation (SURVEY §2.4 A12). That turns an inherently serial loop
into a fully parallel map + partial-agg reduce: the shape that survives
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STARTING_BANKROLL = 1000.0  # reference src/evaluation.py:16
STAKE = 10.0  # reference src/evaluation.py:17
THRESHOLD = 0.55  # reference src/evaluation.py:10


def label_bets(
    df: DataFrame,
    pred_col: str = "prediction",
    line_col: str = "market_line",
    threshold: float = THRESHOLD,
) -> DataFrame:
    """Per-bet outcome label — the reference's branch at
    ``src/evaluation.py:21-28``: win iff ``pred > line AND pred >
    threshold``; loss iff ``pred < line AND (1 − pred) > threshold``;
    else pass."""
    pred, line = F.col(pred_col), F.col(line_col)
    return df.withColumn(
        "bet",
        F.when((pred > line) & (pred > threshold), F.lit("win"))
        .when((pred < line) & ((1.0 - pred) > threshold), F.lit("loss"))
        .otherwise(F.lit("pass")),
    )


def backtest(
    df: DataFrame,
    pred_col: str = "prediction",
    line_col: str = "market_line",
    threshold: float = THRESHOLD,
    starting_bankroll: float = STARTING_BANKROLL,
    stake: float = STAKE,
) -> DataFrame:
    """Single-row result: ``wins, losses, passes, final_bankroll, roi``
    (reference ``src/evaluation.py:10-31``; the per-bet log is
    :func:`label_bets`)."""
    labeled = label_bets(df, pred_col, line_col, threshold)
    wins = F.sum((F.col("bet") == "win").cast("long")).alias("wins")
    losses = F.sum((F.col("bet") == "loss").cast("long")).alias("losses")
    passes = F.sum((F.col("bet") == "pass").cast("long")).alias("passes")
    agg = labeled.agg(wins, losses, passes)
    bankroll = (
        F.lit(starting_bankroll)
        + F.lit(stake) * F.col("wins")
        - F.lit(stake) * F.col("losses")
    )
    return agg.select(
        "wins",
        "losses",
        "passes",
        bankroll.alias("final_bankroll"),
        ((bankroll - starting_bankroll) / starting_bankroll).alias("roi"),
    )


def evaluate_accuracy(
    df: DataFrame, pred_col: str = "prediction", outcome_col: str = "outcome"
) -> DataFrame:
    """``mean((pred >= 0.5) == outcome)`` (reference
    ``src/evaluation.py:33-39``) as a single global avg."""
    correct = (
        (F.col(pred_col) >= 0.5) == (F.col(outcome_col).cast("double") == 1.0)
    ).cast("double")
    return df.agg(F.avg(correct).alias("accuracy"))
