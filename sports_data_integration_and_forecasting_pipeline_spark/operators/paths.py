"""Event-path analysis — per-user ordered event sequences and
regex-subsequence funnel matching.

Complements the set-free session funnel (`plans/battery.py:
session_click_purchase_funnel`, which checks ONE ordered pair via
windowed min/max): this is the general form — the user's full ordered
event-type path materialized as a delimited string, and funnels of any
depth matched as token-bounded regex subsequences (`view ... click ...
purchase` in strict event-time order, arbitrary gaps allowed).

Scale shape: ONE hash aggregation keyed by user (map-side combined
`collect_list`), then pure-Column narrow regex tests — no self-joins,
no per-stage passes; adding funnel stages adds zero shuffles. Path
length is bounded by per-user activity; for power-law users cap the
list with ``F.slice`` after sort (not needed at reference scale).

The path string and the match itself are engine-portable (DuckDB:
ordered `string_agg` + RE2 `regexp_matches`; Spark: sorted
`collect_list` + Java `rlike` — the pattern subset used here behaves
identically in both), so the battery entry hash-matches.

No reference counterpart; part of the events-analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = ">"


def funnel_pattern(stages: list[str], k: int) -> str:
    """Regex matching paths whose tokens contain ``stages[:k]`` as an
    in-order subsequence (full-token matches, any gaps). Uses only the
    regex subset Java and RE2 treat identically — no backrefs or
    lookaround."""
    body = f"{SEP}(.*{SEP})?".join(stages[:k])
    return f"(^|{SEP}){body}({SEP}|$)"


def user_event_paths(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, n_events, path): the user's event types in strict
    (ts, tiebreak) order joined with ``SEP``."""
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("o1"),
                F.col(tiebreak_col).alias("o2"),
                F.col(type_col).alias("t"),
            )
        )
    )
    return df.groupBy(user_col).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.array_join(F.transform(ordered, lambda x: x["t"]), SEP).alias("path"),
    )


def path_funnel(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per user: deepest funnel stage reached, where stage k means
    ``stages[:k]`` appears as an ordered subsequence of the user's
    event-type path. Returns ``(user, n_events, stage_1..stage_K,
    max_stage)``."""
    paths = user_event_paths(df, user_col, ts_col, tiebreak_col, type_col)
    out = paths
    for k in range(1, len(stages) + 1):
        out = out.withColumn(
            f"stage_{k}", F.col("path").rlike(funnel_pattern(stages, k))
        )
    # stages are prefixes of one another, so max_stage = count of true flags
    max_stage = sum(
        (F.col(f"stage_{k}").cast("int") for k in range(1, len(stages) + 1)),
        F.lit(0),
    )
    return out.drop("path").withColumn("max_stage", max_stage.cast("bigint"))
