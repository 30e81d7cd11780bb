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


def rank_sum_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """ROC-AUC via the Mann-Whitney rank-sum identity — the standard
    audit for any model-based filter (is the quality classifier's score
    actually separating the classes, or is its threshold just a
    calibrated coin?): ``AUC = P(score_pos > score_neg) + 0.5 ·
    P(score_pos = score_neg)``, computed exactly from tied-average
    ranks, never from a plot.

    Exact integer discipline: per DISTINCT score the positive/negative
    counts aggregate map-side; the cumulative count below each score
    gives every tie group's doubled average rank ``2·r̄ = 2·cnt_lt +
    n_tie + 1`` (an integer), so ``2·U = Σ_pos-groups n_pos_s · 2·r̄ −
    n_pos·(n_pos+1)`` and ``auc_e6 = 10⁶·2U DIV (2·n_pos·n_neg)`` are
    all exact BIGINT arithmetic — both engines reproduce the value
    bit-for-bit.

    Scale shape: one map-side-combined aggregate to the distinct-score
    table, then a running-sum window over that table ordered by score.
    The window is single-partition, but over DISTINCT SCORES, not rows —
    for integer-quantized scores (the engine's e6 convention) that
    table is bounded by score resolution, not corpus size. 100 TB of
    documents with e6-quantized logits still cumulates over ≤ |score
    universe| rows.

    Returns ONE row: ``(n_pos, n_neg, auc_e6)``."""
    from pyspark.sql.window import Window

    per_score = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.count("*").cast("bigint").alias("__n"),
        F.sum(F.col(label_col).cast("int")).cast("bigint").alias("__np"),
    )
    w = (
        Window.orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_score.withColumn(
        "__cnt_lt", F.coalesce(F.sum("__n").over(w), F.lit(0)).cast("bigint")
    )
    # Σ over positives of the DOUBLED tied-average rank (integer-exact)
    agg = ranked.agg(
        F.sum(
            F.col("__np") * (2 * F.col("__cnt_lt") + F.col("__n") + 1)
        )
        .cast("bigint")
        .alias("__r2_pos"),
        F.sum("__np").cast("bigint").alias("n_pos"),
        F.sum(F.col("__n") - F.col("__np")).cast("bigint").alias("n_neg"),
    )
    u2 = F.col("__r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        "n_pos",
        "n_neg",
        (F.lit(1000000) * u2).cast("bigint").alias("__num"),
    ).select(
        "n_pos",
        "n_neg",
        # degenerate label (one class absent) -> NULL, never a crash:
        # at scale a pinned weak-label predicate CAN legitimately go
        # one-sided on novel content (found by the r11 sf1 probe, where
        # the replica vocabulary pushed every doc past the ppl cut)
        F.expr(
            "CASE WHEN n_pos > 0 AND n_neg > 0 "
            "THEN CAST(__num DIV (2 * n_pos * n_neg) AS BIGINT) "
            "ELSE CAST(NULL AS BIGINT) END"
        ).alias("auc_e6"),
    )
