"""Point-in-time (as-of) join — the canonical time-series enrichment:
for each left row, the most recent right row at or before its timestamp,
per key. (No reference counterpart — the reference never does event-time
arithmetic, SURVEY §1.2 — but any odds/market history analysis needs it:
"which line was live when this bet was placed".)

Scale shape — the union+window form, NOT a range-condition join:

A naive ``left.join(right, key AND r.ts <= l.ts)`` + argmax explodes to
O(|L|·|R|/keys) intermediate rows and usually degrades to a broadcast
nested-loop. Instead, union both sides tagged, then one window per key
ordered by (ts, side) carries the last seen right payload forward —
``last(..., ignorenulls=True)`` over an unbounded-preceding frame. One
shuffle + one sort, output exactly |L| rows, state per task is one
payload struct. This is how production engines (kdb, QuestDB, Flink
temporal join) execute as-of semantics, re-expressed in DataFrame ops.

DuckDB's native ``ASOF JOIN`` provides the independent oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: Column | int | None = None,
) -> DataFrame:
    """Backward as-of join: enrich every ``left`` row with the latest
    ``right`` row whose timestamp is <= the left timestamp (equal
    timestamps match, like pandas ``merge_asof`` / DuckDB ``ASOF JOIN``).

    Right payload columns come back with a ``matched_`` prefix plus
    ``matched_ts``; rows with no prior right row keep NULLs (left join
    semantics). ``tolerance`` (same units as the ts columns) drops
    matches older than ``left_ts - tolerance``.

    Requirements: right side must not carry duplicate (key, ts) pairs —
    the match would be ambiguous (same contract as DuckDB, which picks an
    arbitrary row; raise the question to the caller instead of guessing).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.struct(
            F.col(right_ts).alias("__mts"),
            *[F.col(c) for c in payload_cols],
        ).alias("__payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.select(
        *[F.col(c) for c in left.columns], "__ts", "__is_right", "__payload"
    ).unionByName(
        r.select(
            *[
                F.col(k)
                if k in keys
                else F.lit(None).cast(left.schema[k].dataType).alias(k)
                for k in left.columns
            ],
            "__ts",
            "__is_right",
            "__payload",
        ),
        allowMissingColumns=False,
    )
    # right rows sort BEFORE left rows at equal ts so same-ts marks match
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_right") == 0)
    match_ts = F.col("__match.__mts")
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        keep = match_ts >= (F.col("__ts") - tol)
        out = out.withColumn(
            "__match", F.when(keep, F.col("__match"))
        )
        match_ts = F.col("__match.__mts")
    return out.select(
        *[F.col(c) for c in left.columns],
        match_ts.alias("matched_ts"),
        *[
            F.col(f"__match.{c}").alias(f"matched_{c}")
            for c in payload_cols
        ],
    )
