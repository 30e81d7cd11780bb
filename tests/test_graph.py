"""Integer PageRank: structural properties on a hand-built graph (the
battery's oracle run checks exact parity with DuckDB's unrolled CTEs)."""

import pyspark.sql.functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.graph import (
    pagerank_integer,
    symmetrize,
)


def _star_edges(spark, n_leaves=5):
    rows = [(0, i) for i in range(1, n_leaves + 1)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_star_center_dominates(spark):
    ranks = pagerank_integer(symmetrize(_star_edges(spark)), iterations=3)
    got = {r["node"]: r["pr"] for r in ranks.collect()}
    assert len(got) == 6
    center, leaves = got[0], [got[i] for i in range(1, 6)]
    assert len(set(leaves)) == 1  # symmetry: identical leaves
    assert center > leaves[0]


def test_rank_mass_is_conserved_up_to_floor_loss(spark):
    """Each iteration redistributes at most `nodes * 100` micro-units of
    floor loss; total never grows."""
    sym = symmetrize(_star_edges(spark))
    n = 6
    total0 = n * 1_000_000_000
    for it in (1, 2, 3):
        total = (
            pagerank_integer(sym, iterations=it)
            .agg(F.sum("pr")).collect()[0][0]
        )
        assert total <= total0
        assert total >= total0 - it * n * 200  # floor-division loss bound


def test_dangling_directed_graph_raises(spark):
    """Input contract: a raw directed edge list (leaves are dst-only, so
    they dangle) must raise instead of silently losing rank mass."""
    import pytest

    with pytest.raises(ValueError, match="not symmetrized"):
        pagerank_integer(_star_edges(spark), iterations=1)
    # symmetrized form of the same graph passes the guard
    assert pagerank_integer(symmetrize(_star_edges(spark)), 1).count() == 6


def test_deterministic_across_partitionings(spark):
    e = symmetrize(_star_edges(spark))
    a = {(r["node"], r["pr"]) for r in pagerank_integer(e, 2).collect()}
    b = {
        (r["node"], r["pr"])
        for r in pagerank_integer(e.repartition(7), 2).collect()
    }
    assert a == b
