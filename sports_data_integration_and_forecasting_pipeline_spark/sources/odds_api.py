"""The Odds API source layer (SURVEY §2.1 S1-S2, S4).

Driver-side by design: one HTTP response per fetch is not distributed
work. The fetched JSON becomes a DataFrame via an explicit schema
(:data:`...schemas.ODDS_API_SCHEMA`), after which everything is lazy Spark.

Parity points:
- request shape `{BASE_URL}/{sport}/odds` with ``apiKey, markets, regions,
  oddsFormat`` params and a 30 s timeout (reference
  ``src/ingestion.py:32-54``, ``Sports-Pipeline-V2/odds_utils.py:116-127``);
- md5-keyed JSON file cache with 30-min mtime TTL, raw-response archive,
  stale-cache fallback on API error, empty-list last resort (reference
  ``Sports-Pipeline-V2/odds_utils.py:76-113,130-179``).

The HTTP transport is injectable so tests (and offline runs) never touch
the network.
"""

from __future__ import annotations

import hashlib
import json
import logging
import time
from pathlib import Path
from typing import Any, Callable

logger = logging.getLogger(__name__)

BASE_URL = "https://api.the-odds-api.com/v4/sports"
REQUEST_TIMEOUT_S = 30  # reference src/ingestion.py:52
CACHE_TTL_MINUTES = 30  # reference odds_utils.py:41

Transport = Callable[[str, dict[str, Any], int], Any]


def _default_transport(url: str, params: dict[str, Any], timeout: int):
    import urllib.parse
    import urllib.request

    qs = urllib.parse.urlencode(params)
    with urllib.request.urlopen(f"{url}?{qs}", timeout=timeout) as resp:
        if resp.status >= 400:
            raise RuntimeError(f"HTTP {resp.status} from {url}")
        return json.loads(resp.read().decode("utf-8"))


def fetch_player_props(
    sport: str = "basketball_nba",
    markets: str = "player_points",
    regions: str = "us",
    odds_format: str = "decimal",
    api_key: str | None = None,
    transport: Transport = _default_transport,
) -> list[dict]:
    """S1 plain fetch (reference ``src/ingestion.py:32-54``)."""
    if not api_key:
        raise ValueError("api_key is required for a live fetch")
    params = {
        "apiKey": api_key,
        "markets": markets,
        "regions": regions,
        "oddsFormat": odds_format,
    }
    return transport(f"{BASE_URL}/{sport}/odds", params, REQUEST_TIMEOUT_S)


def _cache_key(params: dict[str, Any]) -> str:
    """md5 of the sort-keyed param JSON (reference ``odds_utils.py:76-78``)."""
    return hashlib.md5(
        json.dumps(params, sort_keys=True).encode("utf-8")
    ).hexdigest()


def fetch_odds(
    api_key: str,
    sport_key: str = "basketball_nba",
    markets: str = "h2h,spreads",
    regions: str = "us",
    use_cache: bool = True,
    cache_ttl_minutes: int = CACHE_TTL_MINUTES,
    cache_dir: str | Path = "data/cache",
    raw_dir: str | Path | None = "data/raw_odds",
    transport: Transport = _default_transport,
) -> list[dict]:
    """S2 cached fetch (reference ``odds_utils.py:130-179``): fresh cache
    hit → cached JSON; else fetch, archive raw, write cache; on fetch error
    fall back to a stale cache if present, else return ``[]``.

    Parity notes: the cache key covers only ``{sport, markets, regions}``
    (``odds_utils.py:156`` — the api key is NOT part of request identity,
    so key rotation keeps the cache warm and no secret ends up md5'd into
    filenames); the live request sends explicit ``oddsFormat=decimal`` /
    ``dateFormat=iso`` (``odds_utils.py:122-123``) instead of trusting
    server defaults; raw archives carry the reference's
    ``{saved_at, data}`` wrapper (``odds_utils.py:113``)."""
    cache_params = {"sport": sport_key, "markets": markets, "regions": regions}
    cache_dir = Path(cache_dir)
    cache_file = cache_dir / f"{_cache_key(cache_params)}.json"

    if use_cache and cache_file.exists():
        age_min = (time.time() - cache_file.stat().st_mtime) / 60.0
        if age_min <= cache_ttl_minutes:
            logger.info("cache hit (%.1f min old): %s", age_min, cache_file)
            return json.loads(cache_file.read_text())

    request_params = {
        "apiKey": api_key,
        "markets": markets,
        "regions": regions,
        "oddsFormat": "decimal",
        "dateFormat": "iso",
    }
    try:
        data = transport(
            f"{BASE_URL}/{sport_key}/odds", request_params, REQUEST_TIMEOUT_S
        )
    except Exception as exc:  # stale fallback (odds_utils.py:172-179)
        logger.warning("odds fetch failed (%s); trying stale cache", exc)
        if cache_file.exists():
            return json.loads(cache_file.read_text())
        return []

    if raw_dir is not None:
        raw_path = Path(raw_dir)
        raw_path.mkdir(parents=True, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S", time.gmtime())
        wrapped = {
            # UTC, matching the reference's datetime.utcnow().isoformat()
            # (odds_utils.py:113) — local time would drift by timezone.
            "saved_at": time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()),
            "data": data,
        }
        (raw_path / f"raw_{sport_key}_{stamp}.json").write_text(
            json.dumps(wrapped, indent=2)
        )
    cache_dir.mkdir(parents=True, exist_ok=True)
    cache_file.write_text(json.dumps(data))
    return data
