"""Iterative graph operators over edge DataFrames.

PageRank here is defined over EXACT integer arithmetic so a distributed
run is bit-identical to any reference implementation regardless of
partitioning or summation order: ranks live in integer micro-units
(``scale`` per node initially) and every division is a floor division.
Floating-point PageRank sums contributions in nondeterministic order and
drifts at 1e-16 per add; the integer form makes the fixpoint
hash-checkable across engines (same discipline as the battery's exact
integer cents).

Scale shape per iteration: one hash join (ranks ⋈ edges on src — the
edge/degree tables are scope-persisted and materialize once) and one
map-side-combined aggregation on dst. Rank lineage is LINEAR in
iterations (each round references its predecessor once), so the rounds
compose lazily into the consumer's single action; a ``localCheckpoint``
valve every 8 rounds bounds plan depth for long runs. Operators whose
rounds SELF-compose (``tree_roots`` pointer doubling — 2^r lineage
copies without truncation) keep a checkpoint per round instead. No
driver-side data moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        persist_scoped,
    )

    # r16: the per-iteration localCheckpoint (an EAGER job per round,
    # plus UnknownPartitioning scans that re-exchanged the rank table
    # every round) is gone. Ranks reference their predecessor exactly
    # once per round, so the lineage is LINEAR in iterations — the whole
    # power iteration composes lazily into the consumer's single action,
    # with e/deg scope-persisted (materialized once inside that action,
    # released by dedup.release_caches — the registry also outlives this
    # function, which the old eager form's function-exit unpersist
    # required). A checkpoint valve every 8 rounds bounds plan depth for
    # long runs.
    e = persist_scoped("pagerank_edges", edges.select(src, dst))
    deg = persist_scoped(
        "pagerank_deg", e.groupBy(src).agg(F.count("*").alias("__deg"))
    )
    if validate_no_dangling:
        dangling = (
            e.select(F.col(dst).alias("node"))
            .distinct()
            .join(deg.select(F.col(src).alias("node")), "node", "left_anti")
            .count()
        )
        if dangling:
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
    )
    for i in range(iterations):
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
        )
        if (i + 1) % 8 == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def knn_sparsify(
    weighted_edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Degree-cap a weighted directed edge list: keep each node's top-``k``
    strongest out-edges (weight desc, then dst asc — pinned total order),
    then fold to distinct undirected edges oriented ``a < b``.

    This is THE scale guard for co-occurrence / similarity graphs: raw
    co-occurrence saturates toward a complete graph as the corpus grows
    (measured on the testdata: the supplier co-supply graph is complete at
    every SF), which makes any downstream wedge join quadratic. A kNN cap
    bounds edges at ``k·n`` and wedges at ``(2k)²·n`` — linear in nodes
    forever. One shuffle (hash on ``src``) for the per-node top-k window;
    the orient+distinct reuses the same partitioning post-AQE.
    """
    w = Window.partitionBy(src).orderBy(F.desc(weight), F.asc(dst))
    kept = (
        weighted_edges.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
    )
    return kept


def triangle_counts(edges_ab: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an oriented edge list
    ``(a, b)`` with ``a < b`` and no duplicates.

    Wedge join: e1(a,b) ⋈ e2(b,c) enumerates each ordered wedge a<b<c
    exactly once; the closure probe e3(a,c) confirms the triangle. Every
    triangle is found once (its vertices sorted), so per-node counts are
    exact. With a kNN-capped input (degree ≤ 2k) the wedge set is linear
    in nodes and both joins broadcast the edge list at small scale /
    shuffle-hash at 100 TB. Returns ``(node, n_triangles)`` for nodes in
    ≥1 triangle.

    The edge list is referenced three times (e1/e2/e3): ``localCheckpoint``
    materializes it once (it is tiny after the kNN cap — ≤ k·n rows) so the
    upstream weighting/sparsification pipeline doesn't replay per
    reference. Per-node counts explode the triangle rows instead of a
    3-way union, which would replay the wedge join three times.
    """
    edges = edges_ab.localCheckpoint()
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    nodes = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .select(F.explode(F.array("x", "y", "z")).alias("node"))
    )
    return nodes.groupBy("node").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )


def tree_roots(
    parents: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_doublings: int = 5,
) -> DataFrame:
    """Root and depth of every node in a forest, by pointer doubling —
    the distributed answer to ``WITH RECURSIVE`` ancestor walks.

    ``parents`` is one row per node: ``(child, parent)`` with parent NULL
    for roots. State rows ``(node, anc, depth)`` hold the farthest known
    ancestor and its exact distance; each round composes the state with
    itself (``state.anc ⋈ state.node``), DOUBLING the reach — a depth-D
    forest converges in ⌈log₂D⌉ rounds, not D (a naive parent-at-a-time
    walk would need D shuffles; at D=20 doubling needs 5). Roots map to
    themselves at distance 0, making composition idempotent at the top —
    no termination test per row, just a fixed round count with
    ``localCheckpoint`` lineage truncation per round (the graph-family
    house pattern). All arithmetic is exact integers.

    OPEN forests (a parent value that never appears as a node) are
    legal: the composition is a LEFT join, and a dangling ancestor
    terminates its chain — the node reports that ancestor as its root
    at the distance already accumulated. The r15 sf1 sweep caught the
    previous inner-join composition silently DROPPING every node whose
    chain exits the node set (sparse key universes do this; dense test
    keys masked it) — row loss is never an acceptable degrade. Callers
    that need a walk through vertices absent from their base table must
    still materialize the closure (see hierarchy_root_depth's digit
    closure) — this operator walks the rows it is given.

    Returns ``(node, root, depth)``.
    """
    state = parents.select(
        F.col(child).alias("node"),
        F.coalesce(F.col(parent), F.col(child)).alias("anc"),
        F.when(F.col(parent).isNull(), 0).otherwise(1).alias("depth"),
    ).localCheckpoint()
    for _ in range(max_doublings):
        jump = state.select(
            F.col("node").alias("j_node"),
            F.col("anc").alias("j_anc"),
            F.col("depth").alias("j_depth"),
        )
        state = (
            state.join(jump, F.col("anc") == F.col("j_node"), "left")
            .select(
                "node",
                F.coalesce(F.col("j_anc"), F.col("anc")).alias("anc"),
                (
                    F.col("depth") + F.coalesce(F.col("j_depth"), F.lit(0))
                ).alias("depth"),
            )
            .localCheckpoint()
        )
    return state.select(
        "node",
        F.col("anc").alias("root"),
        F.col("depth").cast("int").alias("depth"),
    )
