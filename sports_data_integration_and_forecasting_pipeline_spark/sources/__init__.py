"""Sources: driver-side API client + cache (S1-S4) and file readers."""

from .odds_api import fetch_player_props, fetch_odds
from .readers import read_odds_json, games_from_json_strings, load_table

__all__ = [
    "fetch_player_props",
    "fetch_odds",
    "read_odds_json",
    "games_from_json_strings",
    "load_table",
]
