"""Explicit StructType schemas for every table the engine touches.

The reference relies on pandas dtype inference plus ``.get()`` coalescing
for absent JSON keys (reference ``src/processing.py:52,62``,
``Sports-Pipeline-V2/odds_utils.py:191-202``). We instead declare the full
schema up front — absent fields surface as nulls, which reproduces the
``.get()`` tolerance declaratively and lets the JSON/Parquet readers prune
nested fields (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw TheOddsAPI-like response: game -> bookmakers -> markets -> outcomes.
# Field aliases observed across reference variants are all declared so
# F.coalesce can pick them in documented priority order (SURVEY §4.3-10).
OUTCOME_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("outcome", T.StringType()),
        T.StructField("outcome_name", T.StringType()),
        T.StructField("team", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("price", T.StringType()),  # may arrive as "+120" string
        T.StructField("odds", T.StringType()),
        T.StructField("price_decimal", T.StringType()),
        T.StructField("point", T.DoubleType()),
    ]
)

MARKET_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("outcomes", T.ArrayType(OUTCOME_SCHEMA)),
    ]
)

BOOKMAKER_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("last_update", T.StringType()),
        T.StructField("markets", T.ArrayType(MARKET_SCHEMA)),
    ]
)

GAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("sport_key", T.StringType()),
        T.StructField("sport", T.StringType()),
        T.StructField("sport_title", T.StringType()),
        T.StructField("commence_time", T.StringType()),
        T.StructField("home_team", T.StringType()),
        T.StructField("away_team", T.StringType()),
        T.StructField("bookmakers", T.ArrayType(BOOKMAKER_SCHEMA)),
    ]
)

ODDS_API_SCHEMA = T.ArrayType(GAME_SCHEMA)

# Flattened h2h/spreads/totals table (reference src/processing.py:29-31).
FLAT_ODDS_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.StringType()),
        T.StructField("sport", T.StringType()),
        T.StructField("commence_time", T.StringType()),
        T.StructField("home_team", T.StringType()),
        T.StructField("away_team", T.StringType()),
        T.StructField("bookmaker", T.StringType()),
        T.StructField("last_update", T.StringType()),
        T.StructField("market", T.StringType()),
        T.StructField("outcome", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)

# Canonical 11-column props table, fixed order
# (reference src/ingestion.py:105-118, docs/README.md:8-19).
PROPS_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField("game_id", T.StringType()),
        T.StructField("commence_time", T.StringType()),
        T.StructField("home_team", T.StringType()),
        T.StructField("away_team", T.StringType()),
        T.StructField("bookmaker", T.StringType()),
        T.StructField("last_update", T.StringType()),
        T.StructField("player_name", T.StringType()),
        T.StructField("market", T.StringType()),
        T.StructField("line", T.DoubleType()),
        T.StructField("price", T.DoubleType()),
    ]
)

# Player game logs (reference src/features.py:3-8).
GAME_LOG_SCHEMA = T.StructType(
    [
        T.StructField("player", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("points", T.DoubleType()),
        T.StructField("rebounds", T.DoubleType()),
        T.StructField("assists", T.DoubleType()),
    ]
)
