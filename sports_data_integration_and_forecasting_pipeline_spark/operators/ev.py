"""EV / variance / Kelly enrichment (SURVEY §2.3 C5-C10).

The reference computes these row-at-a-time via ``df.apply(..., axis=1)``
(``Sports-Pipeline-V2/ev_calculator.py:55-64``) — its own worst
anti-pattern. Here the whole battery is native column arithmetic inside
one projection: no shuffle, no Python, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.odds_math import (
    RISK_AVERSION,
    adjusted_ev,
    bet_flag,
    bet_variance,
    expected_value,
    half_kelly_fraction,
)


def enrich_dataframe(df: DataFrame, risk_aversion: float = RISK_AVERSION) -> DataFrame:
    """Add ``ev, variance, ev_adj, kelly_fraction, bet_flag`` to a
    standardized odds table (reference
    ``Sports-Pipeline-V2/ev_calculator.py:48-66``).

    ``true_prob`` nulls are backfilled from ``implied_prob``
    (``ev_calculator.py:53``).
    """
    am = F.col("odds_american")
    p = F.coalesce(F.col("true_prob"), F.col("implied_prob"))
    ev = expected_value(am, p)
    out = df.withColumn("true_prob", p).withColumn("ev", ev)
    var = bet_variance(am, F.col("true_prob"), F.col("ev"))
    out = out.withColumn("variance", var)
    return (
        out.withColumn(
            "ev_adj", adjusted_ev(F.col("ev"), F.col("variance"), risk_aversion)
        )
        .withColumn("kelly_fraction", half_kelly_fraction(am, F.col("true_prob")))
        .withColumn("bet_flag", bet_flag(F.col("ev")))
    )


def high_ev_view(enriched: DataFrame, min_ev: float = 0.02) -> DataFrame:
    """The V2 dashboard's display table (reference
    ``Sports-Pipeline-V2/widgets_ui.py:34-61``): pct-formatted derived
    columns, high-EV filter, sorted by adjusted EV descending."""
    return (
        enriched.withColumn("ev_pct", F.round(F.col("ev") * 100.0, 2))
        .withColumn("ev_adj_pct", F.round(F.col("ev_adj") * 100.0, 2))
        .withColumn("kelly_pct", F.round(F.col("kelly_fraction") * 100.0, 2))
        .filter(F.col("ev") >= min_ev)
        .orderBy(F.desc("ev_adj"), F.asc("game_id"), F.asc("outcome"))
    )
