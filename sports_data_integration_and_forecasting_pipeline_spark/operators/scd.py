"""Slowly-changing-dimension (SCD type 2) interval building — collapse a
per-key snapshot/event stream into validity intervals: one row per
(key, attribute-state) run with ``valid_from`` / ``valid_to`` and the
open interval (``valid_to IS NULL``) marking the current state.

The classic warehouse history table, built as gaps-and-islands: a
change flag per row (attribute differs from its lag), a running sum
turning flags into island ids, one aggregation per island, and a lead
over islands closing each interval at the next one's start. All four
steps share the same (key)-partitioned, time-ordered window — Catalyst
plans ONE exchange + sort for the whole pipeline, so a 100 TB history
rebuild costs a single shuffle keyed by the dimension key.

No reference counterpart; the dimension-table companion to the
canonical fact sinks (`sinks/update_canonical_table`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """``(key, attr, valid_from, valid_to, n_rows)`` — maximal runs of
    constant ``attr_col`` per key in (ts, tiebreak) order. ``valid_from``
    is the run's first ts; ``valid_to`` the next run's first ts (NULL on
    the key's current state); ``n_rows`` the observations collapsed."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    flagged = df.select(
        key_col,
        ts_col,
        tiebreak_col,
        attr_col,
        # Null-safe change flag: `lag != attr` is NULL (flag absorbed) when
        # attr transitions non-null -> NULL, silently merging the NULL row
        # into the previous island. eqNullSafe treats NULL as a comparable
        # state: NULL->NULL continues an island, x->NULL / NULL->x breaks
        # one, and the partition's first row (lag missing) flags correctly
        # for any non-null attr while an all-NULL head starts island 0 —
        # still a well-formed group.
        F.when(
            F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col)), 0
        )
        .otherwise(1)
        .alias("__chg"),
    ).withColumn(
        "__island",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy(key_col, "__island").agg(
        # all rows in an island share the attr by construction; min is
        # the deterministic way to say so in any engine
        F.min(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("bigint").alias("n_rows"),
    )
    wi = Window.partitionBy(key_col).orderBy("__island")
    return islands.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(wi).alias("valid_to"),
        "n_rows",
    )
