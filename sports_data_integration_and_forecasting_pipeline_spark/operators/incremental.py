"""Incremental rollup maintenance — merge partial aggregates instead of
recomputing, the batch twin of streaming state updates and the engine
behind incrementally-maintained reporting tables.

The contract: for decomposable aggregates (sum / count / min / max —
anything with a merge function), ``merge_rollups(agg(base), agg(delta))
== agg(base ∪ delta)``. At 100 TB this is the difference between
touching yesterday's 100 TB again and touching today's 100 GB delta:
the stored rollup is (groups × metrics) — orders of magnitude smaller
than the fact table — and the merge is one map-side-combined shuffle of
rollup-sized inputs.

Averages and other ratios must be carried as their decomposed parts
(sum + count) and derived AFTER the merge — merging averages directly
is the classic wrong answer.

The battery entry's oracle IS the full recompute (DuckDB aggregates
base ∪ delta from scratch), so the merge contract itself is what gets
hash-checked. No reference counterpart; generalizes the reference's
append-only canonical-table flow (src/ingestion.py:132-142) to
aggregated state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metric name -> merge function over partial values
_MERGE_FNS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def rollup_partial(
    df: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
) -> DataFrame:
    """Build a mergeable partial rollup: ``metrics`` maps output column
    -> (kind, input column) with kind in {sum, count, min, max}.
    ``count`` ignores its input column (counts rows)."""
    aggs = []
    for out, (kind, col) in metrics.items():
        if kind == "count":
            aggs.append(F.count("*").cast("bigint").alias(out))
        elif kind == "sum":
            aggs.append(F.sum(col).alias(out))
        elif kind in ("min", "max"):
            aggs.append(getattr(F, kind)(col).alias(out))
        else:
            raise ValueError(f"non-decomposable metric kind: {kind}")
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    rollups: list[DataFrame],
    keys: list[str],
    metrics: dict[str, str],
) -> DataFrame:
    """Merge partial rollups produced by :func:`rollup_partial`:
    ``metrics`` maps column -> kind in {sum, count, min, max}. Groups
    present in only some partials merge correctly (union semantics)."""
    merged = rollups[0]
    for r in rollups[1:]:
        merged = merged.unionByName(r)
    aggs = []
    for col, kind in metrics.items():
        fn = _MERGE_FNS.get(kind)
        if fn is None:
            raise ValueError(f"non-decomposable metric kind: {kind}")
        out = fn(col).alias(col)
        if kind == "count":
            out = fn(col).cast("bigint").alias(col)
        aggs.append(out)
    return merged.groupBy(*keys).agg(*aggs)
