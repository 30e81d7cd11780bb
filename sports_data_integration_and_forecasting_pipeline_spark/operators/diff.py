"""Snapshot/table diffing — the dataset-versioning primitive: given two
keyed snapshots, classify every key as ``added`` / ``removed`` /
``changed`` / ``unchanged`` without comparing column lists row-by-row in
Python. The comparison rides a single md5 row fingerprint (engine-portable,
same hash discipline as the dedup family), so the diff is ONE full outer
hash join on the key — the shape that survives 100 TB: both sides
shuffle-partition on the key once, no row-wise UDFs, no driver state.

The reference's closest surface is the canonical append sink's
"keep the latest snapshot per key" semantics (src/ingestion.py:132-142);
a diff between consecutive canonical versions is how its pipelines would
audit what an ingest changed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unit separator / null sentinel: concat_ws SKIPS nulls, which would make
# ("a", NULL, "b") collide with ("a", "b", NULL); coalescing every column
# to an explicit sentinel keeps the fingerprint positional.
_SEP = "\x1f"
_NULL = "\x00null"


def row_fingerprint(cols: list[str]) -> Column:
    """md5 over the listed columns, positionally null-safe, byte-identical
    in Spark and DuckDB (both render bigint/strings the same through
    CAST AS VARCHAR; floats should be pre-converted to exact integer
    cents by the caller — the house rule for cross-engine floats)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns ``key_cols + (status, old_fp, new_fp)`` where status ∈
    ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (both sides, fingerprints differ), ``unchanged``
    (emitted only with ``include_unchanged=True`` — at scale the
    unchanged set is the bulk of the data and callers usually want the
    delta only).

    Scale shape: each side reduces to ``(key, fingerprint)`` in a narrow
    projection, then ONE full outer join hash-partitioned on the key.
    Duplicate keys within a snapshot are the caller's bug; the join
    would multiply them visibly rather than silently pick one.
    """
    fp = row_fingerprint(value_cols)
    o = old.select(*key_cols, fp.alias("old_fp"))
    n = new.select(*key_cols, fp.alias("new_fp"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*key_cols, status.alias("status"), "old_fp", "new_fp")
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
