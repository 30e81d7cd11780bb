"""Interval-overlap (range) join — the binned equi-join form.

A raw range predicate (``a.s <= b.e AND b.s <= a.e``) gives Catalyst no
equi-key, so it plans a broadcast-nested-loop or cartesian product —
O(|A|·|B|) at any scale. The standard fix: quantize time into bins of
width ``w``, explode each interval into the bins it covers (narrow; an
interval of length L yields ~L/w + 1 rows), equi-join on the bin, then
apply the exact overlap predicate. Candidate volume is Σ_bin n_a(bin) ·
n_b(bin) — local density squared, not global size squared.

Duplicate suppression without a distinct shuffle: a pair overlapping k
shared bins would surface k times, so emit only where the join bin is
the FIRST overlapping bin (``max(a.s, b.s) // w``) — an exact filter,
no dropDuplicates pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bin_width: int,
    start_col: str = "s",
    end_col: str = "e",
    suffixes: tuple[str, str] = ("_a", "_b"),
    extra_pred=None,
) -> DataFrame:
    """All (left, right) interval pairs that overlap (closed intervals,
    integer units). Columns come back suffixed; ``extra_pred`` (a
    function of the joined DataFrame → Column) restricts pairs, e.g.
    ``lambda d: d["user_id_a"] < d["user_id_b"]`` for a de-duplicated
    self-join."""
    sa, sb = suffixes

    def binned(df: DataFrame, suffix: str) -> DataFrame:
        renamed = df.select(
            *[F.col(c).alias(f"{c}{suffix}") for c in df.columns]
        )
        s, e = F.col(f"{start_col}{suffix}"), F.col(f"{end_col}{suffix}")
        bins = F.sequence(
            (s / bin_width).cast("long"), (e / bin_width).cast("long")
        )
        return renamed.withColumn("__bin", F.explode(bins))

    a, b = binned(left, sa), binned(right, sb)
    s_a, e_a = F.col(f"{start_col}{sa}"), F.col(f"{end_col}{sa}")
    s_b, e_b = F.col(f"{start_col}{sb}"), F.col(f"{end_col}{sb}")
    joined = (
        a.join(b, "__bin")
        .filter((s_a <= e_b) & (s_b <= e_a))
        # first-overlapping-bin filter: exact dedup, no extra shuffle
        .filter(
            F.col("__bin") == (F.greatest(s_a, s_b) / bin_width).cast("long")
        )
    )
    if extra_pred is not None:
        joined = joined.filter(extra_pred(joined))
    return joined.drop("__bin")
