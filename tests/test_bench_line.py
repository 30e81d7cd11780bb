"""The driver keeps only the last ~2000 chars of bench stdout, so the
final line must stay ≤1800 chars at ANY battery size (r6 review task 6:
prove the truncation loop holds past 200+ entries with a synthetic
registry)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import compact_bench_line

BASE = {
    "metric": "battery_total_wall",
    "value": 123.456,
    "unit": "sec",
    "calib_md5_sec": 1.9,
    "calib_shuffle_sec": 0.8,
    "calib_floor_sec": 0.11,
    "normalized_total": 24.1,
    "normalized_work": 18.3,
    "sf": 0.1,
}


def _fake_timings(n: int) -> dict[str, float]:
    return {
        f"synthetic_query_with_a_long_descriptive_name_{i:04d}": round(
            0.05 + (i % 37) * 0.123, 3
        )
        for i in range(n)
    }


def test_compact_line_fits_at_250_entries():
    timings = _fake_timings(250)
    line = compact_bench_line(BASE, timings)
    assert len(line) <= 1800
    obj = json.loads(line)
    assert obj["metric"] == "battery_total_wall"
    kept = obj["queries"]
    omitted = obj.get("queries_omitted", 0)
    assert len(kept) + omitted == 250
    # rollup accounts for every dropped second
    total_listed = sum(kept.values()) + obj.get("queries_omitted_sec", 0.0)
    assert abs(total_listed - sum(timings.values())) < 0.01
    # the kept set is the most expensive tail, not arbitrary
    floor_kept = min(kept.values())
    dropped_max = max(
        (v for k, v in timings.items() if k not in kept), default=0.0
    )
    assert dropped_max <= floor_kept


def test_compact_line_degrades_to_zero_queries_under_tiny_budget():
    timings = _fake_timings(50)
    line = compact_bench_line(BASE, timings, budget=300)
    assert len(line) <= 300
    obj = json.loads(line)
    assert obj["queries"] == {}
    assert obj["queries_omitted"] == 50


def test_compact_line_keeps_everything_when_small():
    timings = _fake_timings(3)
    obj = json.loads(compact_bench_line(BASE, timings))
    assert obj["queries"] == timings
    assert "queries_omitted" not in obj
