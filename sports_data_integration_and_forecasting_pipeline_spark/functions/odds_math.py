"""Odds / probability / EV scalar math as native Spark Column expressions.

Every function here is closed-form arithmetic the reference computes with
numpy or row-wise ``apply`` (reference ``src/processing.py:9-19``,
``Sports-Pipeline-V2/ev_calculator.py:16-45``). Expressed as ``Column``
expressions they stay inside whole-stage codegen — no Python boundary on
the hot path (SURVEY §2.3, §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Constants pinned by the reference (SURVEY §6).
EV_BET_THRESHOLD = 0.02  # ev_calculator.py:65
KELLY_CAP = 0.05  # ev_calculator.py:37
KELLY_MULTIPLIER = 0.5  # ev_calculator.py:44
RISK_AVERSION = 0.5  # ev_calculator.py:32-34
DEVIG_POWER = 1.05  # odds_utils.py:237


def coerce_numeric(col: Column) -> Column:
    """Strip a leading ``+`` and cast to double; bad values become null.

    Parity with ``_maybe_convert_to_numeric`` (reference
    ``src/processing.py:22-24``): pandas ``to_numeric(errors="coerce")``
    maps to ``try_cast`` null semantics.
    """
    return F.regexp_replace(col.cast("string"), r"^\+", "").try_cast("double")


def american_to_decimal(odds: Column) -> Column:
    """American → decimal odds: ``+120 → 2.2``, ``-140 → 1 + 100/140``.

    Parity with reference ``src/processing.py:9-19`` (strictly-positive
    branch; zero falls into the negative branch exactly as the numpy
    mask ``odds > 0`` does).
    """
    odds = odds.cast("double")
    return F.when(odds > 0, odds / 100.0 + 1.0).otherwise(100.0 / -odds + 1.0)


def decimal_to_american(dec: Column) -> Column:
    """Decimal → American odds, 2-dp rounded; ``d <= 1`` or null → null.

    Parity with ``_decimal_to_american`` (reference
    ``Sports-Pipeline-V2/odds_utils.py:61-73``).
    """
    dec = dec.cast("double")
    return (
        F.when(dec.isNull() | (dec <= 1.0), F.lit(None).cast("double"))
        .when(dec >= 2.0, F.round((dec - 1.0) * 100.0, 2))
        .otherwise(F.round(-100.0 / (dec - 1.0), 2))
    )


def is_american(price: Column) -> Column:
    """The reference's per-row format heuristic: American iff
    ``price <= 0 OR abs(price) >= 100`` (``src/processing.py:101``).

    Quirk preserved verbatim: genuine decimal odds ≥ 100 would be
    misclassified (SURVEY §4.3-1) — do not "fix".
    """
    price = price.cast("double")
    return (price <= 0) | (F.abs(price) >= 100)


def to_decimal_odds(price: Column) -> Column:
    """Normalize a mixed American/decimal price column to decimal odds
    using the per-row heuristic (reference ``src/processing.py:98-112``)."""
    price = price.cast("double")
    return F.when(is_american(price), american_to_decimal(price)).otherwise(price)


def implied_prob(decimal_odds: Column) -> Column:
    """``1 / decimal_odds`` (reference ``src/analysis.py:34-36``)."""
    return F.lit(1.0) / decimal_odds.cast("double")


def _payout(american_odds: Column) -> Column:
    return american_to_decimal(american_odds) - 1.0


def expected_value(american_odds: Column, true_prob: Column) -> Column:
    """EV per $1 stake: ``p·(d−1) − (1−p)``
    (reference ``Sports-Pipeline-V2/ev_calculator.py:16-21``)."""
    b = _payout(american_odds)
    p = true_prob.cast("double")
    return p * b - (1.0 - p)


def bet_variance(
    american_odds: Column, true_prob: Column, ev: Column | None = None
) -> Column:
    """Outcome variance for a $1 stake:
    ``p·(payout−EV)² + (1−p)·(−1−EV)²`` (``ev_calculator.py:24-29``)."""
    b = _payout(american_odds)
    p = true_prob.cast("double")
    e = ev if ev is not None else expected_value(american_odds, true_prob)
    return p * F.pow(b - e, 2) + (1.0 - p) * F.pow(F.lit(-1.0) - e, 2)


def adjusted_ev(ev: Column, variance: Column, risk_aversion: float = RISK_AVERSION) -> Column:
    """Variance-penalized EV: ``EV − λ·Var`` (``ev_calculator.py:32-34``)."""
    return ev - F.lit(risk_aversion) * variance


def half_kelly_fraction(
    american_odds: Column, true_prob: Column, cap: float = KELLY_CAP
) -> Column:
    """Half-Kelly stake fraction, floored at 0 and capped
    (``ev_calculator.py:37-45``): ``min(cap, max(0, (b·p − q)/b) · 0.5)``,
    with ``b <= 0 → 0``."""
    b = _payout(american_odds)
    p = true_prob.cast("double")
    q = 1.0 - p
    full = F.when(b > 0, (b * p - q) / b).otherwise(F.lit(0.0))
    return F.least(F.greatest(full, F.lit(0.0)) * KELLY_MULTIPLIER, F.lit(cap))


def bet_flag(ev: Column, threshold: float = EV_BET_THRESHOLD) -> Column:
    """``ev >= 0.02`` (``ev_calculator.py:65``)."""
    return ev >= threshold
