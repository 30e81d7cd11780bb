"""Sources: driver-side API client + cache (S1-S4), file readers, and the
application-log read-back view."""

from .odds_api import fetch_player_props, fetch_odds
from .readers import read_odds_json, games_from_json_strings, load_table
from .logs import configure_file_logging, read_log_entries, render_log_text

__all__ = [
    "fetch_player_props",
    "fetch_odds",
    "read_odds_json",
    "games_from_json_strings",
    "load_table",
    "configure_file_logging",
    "read_log_entries",
    "render_log_text",
]
