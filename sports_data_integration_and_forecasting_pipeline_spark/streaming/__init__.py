"""Structured Streaming surface (SURVEY §2.9/§7.3-6).

The reference is batch-only; its stream-*shaped* construct is the
append-only canonical snapshot table (``src/ingestion.py:132-142``,
described as a line-change table for replay at ``docs/README.md:40``).
This package exposes that table as a real stream: file source →
watermarked dedup / windowed rollups / stateful line-movement detection →
append sink.
"""

from sports_data_integration_and_forecasting_pipeline_spark.streaming.canonical import (
    dedup_line_changes,
    detect_line_moves,
    game_session_stream,
    join_with_game_meta,
    market_rollup_stream,
    read_snapshot_stream,
    run_available_now,
    with_event_time,
    write_canonical_stream,
)

__all__ = [
    "read_snapshot_stream",
    "with_event_time",
    "dedup_line_changes",
    "market_rollup_stream",
    "game_session_stream",
    "join_with_game_meta",
    "detect_line_moves",
    "write_canonical_stream",
    "run_available_now",
]
