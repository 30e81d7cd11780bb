"""S1/S2 source-layer unit tests (injectable transport; no network):
cache identity, TTL, stale fallback, raw-archive wrapper — the reference
parity points from Sports-Pipeline-V2/odds_utils.py:76-179.
"""

from __future__ import annotations

import json
import os
import time

from sports_data_integration_and_forecasting_pipeline_spark.sources.odds_api import fetch_odds

PAYLOAD = [{"id": "game_1", "bookmakers": []}]


def _transport(calls):
    def t(url, params, timeout):
        calls.append((url, dict(params), timeout))
        return PAYLOAD

    return t


def test_fetch_writes_cache_and_wrapped_raw(tmp_path):
    calls = []
    got = fetch_odds(
        "KEY",
        "basketball_nba",
        cache_dir=tmp_path / "cache",
        raw_dir=tmp_path / "raw",
        transport=_transport(calls),
    )
    assert got == PAYLOAD
    assert len(calls) == 1
    url, params, timeout = calls[0]
    assert url.endswith("/basketball_nba/odds") and timeout == 30
    # live request sends explicit formats (reference odds_utils.py:122-123)
    assert params["oddsFormat"] == "decimal" and params["dateFormat"] == "iso"

    raws = list((tmp_path / "raw").iterdir())
    assert len(raws) == 1
    wrapped = json.loads(raws[0].read_text())
    # reference's {saved_at, data} archive wrapper (odds_utils.py:113)
    assert set(wrapped) == {"saved_at", "data"} and wrapped["data"] == PAYLOAD


def test_cache_key_excludes_api_key(tmp_path):
    """Key rotation must not invalidate the cache, and no secret may be
    md5'd into a filename (reference keys on {sport, markets, regions}
    only, odds_utils.py:156)."""
    calls = []
    fetch_odds("KEY_A", "basketball_nba", cache_dir=tmp_path, raw_dir=None,
               transport=_transport(calls))
    got = fetch_odds("KEY_B", "basketball_nba", cache_dir=tmp_path, raw_dir=None,
                     transport=_transport(calls))
    assert got == PAYLOAD
    assert len(calls) == 1  # second call served from cache despite new key


def test_stale_cache_ttl_refetches(tmp_path):
    calls = []
    fetch_odds("K", "basketball_nba", cache_dir=tmp_path, raw_dir=None,
               transport=_transport(calls))
    cache_file = next(tmp_path.glob("*.json"))
    old = time.time() - 31 * 60  # past the 30-min TTL
    os.utime(cache_file, (old, old))
    fetch_odds("K", "basketball_nba", cache_dir=tmp_path, raw_dir=None,
               transport=_transport(calls))
    assert len(calls) == 2


def test_fetch_error_falls_back_to_stale_cache_then_empty(tmp_path):
    calls = []
    fetch_odds("K", "basketball_nba", cache_dir=tmp_path, raw_dir=None,
               transport=_transport(calls))
    cache_file = next(tmp_path.glob("*.json"))
    old = time.time() - 99 * 60
    os.utime(cache_file, (old, old))

    def boom(url, params, timeout):
        raise RuntimeError("api down")

    got = fetch_odds("K", "basketball_nba", cache_dir=tmp_path, raw_dir=None,
                     transport=boom)
    assert got == PAYLOAD  # stale cache beats nothing (odds_utils.py:172-179)

    got2 = fetch_odds("K", "other_sport", cache_dir=tmp_path, raw_dir=None,
                      transport=boom)
    assert got2 == []  # no cache at all -> empty-list last resort
