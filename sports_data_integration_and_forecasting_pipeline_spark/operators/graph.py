"""Iterative graph operators over edge DataFrames.

PageRank here is defined over EXACT integer arithmetic so a distributed
run is bit-identical to any reference implementation regardless of
partitioning or summation order: ranks live in integer micro-units
(``scale`` per node initially) and every division is a floor division.
Floating-point PageRank sums contributions in nondeterministic order and
drifts at 1e-16 per add; the integer form makes the fixpoint
hash-checkable across engines (same discipline as the battery's exact
integer cents).

Scale shape per iteration: one hash join (ranks ⋈ edges on src — both
sides share the src/dst hash partitioning round-over-round) and one
map-side-combined aggregation on dst. ``localCheckpoint`` truncates
lineage so iteration N doesn't replay 1..N-1. No driver-side data moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of a directed edge list: both orientations of every
    distinct edge. Guarantees no dangling nodes among edge endpoints, so
    plain inner joins carry the full rank mass."""
    e = edges.select(src, dst).distinct()
    return e.unionByName(
        e.select(F.col(dst).alias(src), F.col(src).alias(dst))
    )


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
    src: str = "src",
    dst: str = "dst",
    validate_no_dangling: bool = True,
) -> DataFrame:
    """Integer PageRank over an already-symmetrized edge list.

    Per node: ``pr_0 = scale``; each iteration
    ``pr_{k+1} = (100-damping_pct)*scale DIV 100
    + damping_pct * sum_over_in_neighbors(pr_k DIV out_degree) DIV 100``.
    All operations are exact bigint arithmetic (floor division of
    non-negative values), so any engine computes identical ranks.
    Returns ``(node, pr)`` after ``iterations`` rounds.

    Input contract — ENFORCED: every destination must also appear as a
    source (what :func:`symmetrize` guarantees). A raw directed graph
    violating this would silently bleed rank mass through the inner joins
    (dangling nodes absorb contributions but emit none, and nodes with no
    in-edges vanish from the output). ``validate_no_dangling=True`` (the
    default) spends one anti-join count on the persisted edge list to
    raise instead; pass ``False`` only when the caller constructed the
    edges via :func:`symmetrize` in the same plan and wants the check's
    job back.
    """
    e = edges.select(src, dst).persist()
    deg = e.groupBy(src).agg(F.count("*").alias("__deg")).persist()
    deg.count()  # materialize both once; they feed every iteration
    if validate_no_dangling:
        dangling = (
            e.select(F.col(dst).alias("node"))
            .distinct()
            .join(deg.select(F.col(src).alias("node")), "node", "left_anti")
            .count()
        )
        if dangling:
            e.unpersist()
            deg.unpersist()
            raise ValueError(
                f"pagerank_integer: {dangling} destination node(s) never "
                "appear as a source — the edge list is not symmetrized, "
                "and inner joins would silently drop their rank mass. "
                "Run the edges through symmetrize() first (or pass "
                "validate_no_dangling=False if symmetry is guaranteed "
                "by construction)."
            )
    base = (100 - damping_pct) * scale // 100
    ranks = deg.select(
        F.col(src).alias("node"), F.lit(scale).cast("long").alias("pr")
    ).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            e.join(deg, src)
            .join(ranks, F.col(src) == F.col("node"))
            .select(
                F.col(dst).alias("__to"),
                F.expr("pr DIV __deg").alias("__c"),
            )
        )
        ranks = (
            contrib.groupBy(F.col("__to").alias("node"))
            .agg(F.sum("__c").alias("__s"))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * __s) DIV 100")
                ).cast("long").alias("pr"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    deg.unpersist()
    return ranks
