"""Column-expression library (all JVM-side, codegen-friendly; zero UDFs)."""

from .odds_math import (
    american_to_decimal,
    decimal_to_american,
    to_decimal_odds,
    implied_prob,
    coerce_numeric,
    expected_value,
    bet_variance,
    adjusted_ev,
    half_kelly_fraction,
    bet_flag,
)

__all__ = [
    "american_to_decimal",
    "decimal_to_american",
    "to_decimal_odds",
    "implied_prob",
    "coerce_numeric",
    "expected_value",
    "bet_variance",
    "adjusted_ev",
    "half_kelly_fraction",
    "bet_flag",
]
