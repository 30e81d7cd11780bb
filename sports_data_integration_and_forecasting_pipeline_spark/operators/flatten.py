"""Nested odds-JSON → tidy tables via explode chains (SURVEY §2.2 F1-F6).

The reference flattens with nested Python loops building row dicts
(``src/ingestion.py:75-104``, ``src/processing.py:36-64``,
``Sports-Pipeline-V2/odds_utils.py:182-206``). Here each flatten is a lazy
``explode`` chain with the market-key filter placed *between* the market
and outcome explodes — Catalyst pushes it ahead of the innermost explode so
non-matching markets never fan out (the declarative version of the
reference's ``continue`` at ``src/ingestion.py:89-90``).

At 100 TB scale: explode is narrow (no shuffle); the fan-out factor is
bounded (≤ ~30 outcomes per market), so input-split parallelism carries
through. Nested-schema pruning keeps the scan reading only referenced
struct fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.odds_math import coerce_numeric


def _exploded_outcomes(games: DataFrame, market_keys: list[str]) -> DataFrame:
    """Common game → bookmaker → market → outcome explode chain."""
    return (
        games.select(
            "*",
            F.explode("bookmakers").alias("_bk"),
        )
        .select("*", F.explode("_bk.markets").alias("_mkt"))
        # Market filter before the innermost explode (F2).
        .filter(F.col("_mkt.key").isin(market_keys))
        .select("*", F.explode("_mkt.outcomes").alias("_o"))
    )


def flatten_odds_to_df(games: DataFrame, market: str = "h2h") -> DataFrame:
    """Flatten to the 10-column tidy table (F3; reference
    ``src/processing.py:27-70``).

    Semantics preserved: synthetic ``game_id = {home}_vs_{away}_{commence}``
    (``processing.py:38``); ``sport = coalesce(sport_key, sport)``
    (``processing.py:39``); price alias order ``price → odds →
    price_decimal`` (``processing.py:52``); outcome alias order ``name →
    outcome → outcome_name`` (``processing.py:62``); price coerced to
    double with ``+`` stripped (``processing.py:68-69``).
    """
    ex = _exploded_outcomes(games, [market])
    return ex.select(
        F.concat_ws(
            "_",
            F.coalesce(F.col("home_team"), F.lit("")),
            F.lit("vs"),
            F.coalesce(F.col("away_team"), F.lit("")),
            F.coalesce(F.col("commence_time"), F.lit("")),
        ).alias("game_id"),
        F.coalesce("sport_key", "sport").alias("sport"),
        "commence_time",
        "home_team",
        "away_team",
        F.col("_bk.title").alias("bookmaker"),
        F.col("_bk.last_update").alias("last_update"),
        F.col("_mkt.key").alias("market"),
        F.coalesce("_o.name", "_o.outcome", "_o.outcome_name").alias("outcome"),
        coerce_numeric(
            F.coalesce("_o.price", "_o.odds", "_o.price_decimal")
        ).alias("price"),
    )


def props_to_dataframe(games: DataFrame, markets: str = "player_points") -> DataFrame:
    """Flatten to the canonical 11-column props table (F1; reference
    ``src/ingestion.py:71-119``): ingestion ``timestamp`` stamped at plan
    time, ``player_name`` from ``outcome.description``, ``line`` from
    ``outcome.point``. Empty input still yields the full schema
    (``ingestion.py:105-118``; SURVEY §4.3-7).
    """
    ex = _exploded_outcomes(games, [markets])
    return ex.select(
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(
            "timestamp"
        ),
        F.col("id").alias("game_id"),
        "commence_time",
        "home_team",
        "away_team",
        F.col("_bk.title").alias("bookmaker"),
        F.col("_bk.last_update").alias("last_update"),
        F.col("_o.description").alias("player_name"),
        F.col("_mkt.key").alias("market"),
        F.col("_o.point").cast("double").alias("line"),
        coerce_numeric(F.col("_o.price")).alias("price"),
    )


def standardize_flatten(games: DataFrame, market_keys: list[str]) -> DataFrame:
    """V2 flatten across several markets at once (F4; reference
    ``Sports-Pipeline-V2/odds_utils.py:182-206``).

    V2 alias differences preserved: ``game_id = coalesce(api id,
    synthetic)`` (``odds_utils.py:194``), outcome ``name → description →
    team`` (``odds_utils.py:202``), price column named ``price_decimal``
    and coerced immediately (``odds_utils.py:203``). The per-key Python
    loop becomes a single ``isin`` filter over one explode chain.
    """
    ex = _exploded_outcomes(games, market_keys)
    return ex.select(
        F.coalesce(
            "id",
            F.concat_ws(
                "_",
                F.col("home_team"),
                F.lit("vs"),
                F.col("away_team"),
                F.col("commence_time"),
            ),
        ).alias("game_id"),
        "sport_key",
        "commence_time",
        "home_team",
        "away_team",
        F.col("_bk.title").alias("bookmaker"),
        F.col("_bk.last_update").alias("last_update"),
        F.col("_mkt.key").alias("market"),
        F.coalesce("_o.name", "_o.description", "_o.team").alias("outcome"),
        coerce_numeric(
            F.coalesce("_o.price", "_o.odds", "_o.price_decimal")
        ).alias("price_decimal"),
    )
