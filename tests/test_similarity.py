"""Unit tests for embedding similarity search on tiny hand-computed
vectors (dim kept small; operators are dim-agnostic)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_dup_pairs,
    cosine_topk,
    hyperplanes,
    plane_sign,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact_values(spark):
    df = _emb(
        spark,
        [
            (0, [1.0, 0.0]),  # query
            (1, [1.0, 0.0]),  # cos 1
            (2, [1.0, 1.0]),  # cos 1/sqrt(2)
            (3, [0.0, 1.0]),  # cos 0
            (4, [-1.0, 0.0]),  # cos -1
        ],
    )
    rows = cosine_topk(df, query_pred=F.col("vec_id") == 0, k=3).collect()
    assert [(r["rank"], r["cand_id"]) for r in rows] == [(1, 1), (2, 2), (3, 3)]
    by_cand = {r["cand_id"]: r["cosine"] for r in rows}
    assert by_cand[1] == 1.0
    assert abs(by_cand[2] - 1 / math.sqrt(2)) < 1e-12
    assert by_cand[3] == 0.0


def test_cosine_topk_tie_breaks_on_cand_id(spark):
    df = _emb(spark, [(0, [1.0, 0.0]), (5, [2.0, 0.0]), (3, [3.0, 0.0])])
    rows = cosine_topk(df, query_pred=F.col("vec_id") == 0, k=2).collect()
    # both candidates have cosine 1.0 -> lower id first
    assert [(r["rank"], r["cand_id"]) for r in rows] == [(1, 3), (2, 5)]


def test_ann_lsh_only_scores_same_bucket(spark):
    # planes for dim=2 are [-1,1] and [1,-1]; [2,1] and [2,0.9] land in
    # bucket 2, the negation [-2,-1] in bucket 1 -> never scored.
    planes = hyperplanes(n_planes=2, dim=2)
    df = _emb(spark, [(0, [2.0, 1.0]), (1, [2.0, 0.9]), (2, [-2.0, -1.0])])
    rows = ann_lsh_topk(
        df, query_pred=F.col("vec_id") == 0, n_planes=2, dim=2, k=5
    ).collect()
    cands = {r["cand_id"] for r in rows}
    assert 2 not in cands
    assert cands == {1}
    assert isinstance(planes[0][0], float) and abs(planes[0][0]) == 1.0


def test_plane_sign_deterministic():
    assert plane_sign(3, 7) == plane_sign(3, 7)
    assert plane_sign(0, 0) in (1.0, -1.0)
    # not all-equal over a window of indices (sanity of the md5 derivation)
    signs = {plane_sign(p, d) for p in range(4) for d in range(16)}
    assert signs == {1.0, -1.0}


def test_cosine_dup_pairs_exact_vs_threshold(spark):
    df = _emb(
        spark,
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cosine_dup_pairs(df, threshold=0.9).collect()}
    assert pairs == {(1, 2)}
    all_pairs = cosine_dup_pairs(df, threshold=-1.0).count()
    assert all_pairs == 3  # every unordered pair scored


def test_cosine_dup_pairs_lsh_bucketed(spark):
    df = _emb(spark, [(1, [2.0, 1.0]), (2, [2.0, 0.9]), (3, [-2.0, -1.0])])
    got = cosine_dup_pairs(
        df, threshold=0.9, exact=False, n_planes=2, dim=2
    ).collect()
    # (1,2) collide in bucket 2 with cosine ~0.999; 3 is in another bucket,
    # so the perfect anti-correlation pair is (correctly) never considered.
    assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}


def test_cosine_dup_pairs_blocked_matches_exact(spark):
    """The BLAS blocked-matmul baseline (driver-bounded, documented exact
    path) must agree pair-for-pair and value-for-value with the
    sequential-fold exact variant after engine-identical rounding."""
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        cosine_dup_pairs_blocked,
    )

    def _r6(c):
        return F.floor(c.cast("double") * 1e6 + 0.5) / 1e6

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    blocked = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_dup_pairs_blocked(emb, threshold=0.35, round_dp=6).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_dup_pairs(emb, threshold=0.35, round_expr=_r6).collect()
    }
    assert blocked == exact and len(blocked) > 0


def test_cosine_dup_pairs_blocked_enforces_collect_bound(spark):
    """r7 (VERDICT r6 task 2): the dense baseline's driver-collect bound
    is enforced, not just documented — an over-bound embeddings frame
    raises loudly (naming the LSH path) instead of collecting."""
    import pytest

    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        DENSE_COLLECT_MAX_ROWS,
        cosine_dup_pairs_blocked,
    )

    big = spark.range(DENSE_COLLECT_MAX_ROWS + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(AssertionError, match="dense-collect precondition"):
        cosine_dup_pairs_blocked(big)


def test_cosine_dup_pairs_bucketed_subset_of_exact(spark):
    """The LSH-bucketed scale path returns a subset of the exact pair set
    (same values on the pairs it does return)."""
    from pyspark.sql import functions as F

    def _r6(c):
        return F.floor(c.cast("double") * 1e6 + 0.5) / 1e6

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_dup_pairs(emb, threshold=0.35, round_expr=_r6).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_dup_pairs(
            emb, threshold=0.35, exact=False, n_planes=6, dim=64, round_expr=_r6
        ).collect()
    }
    assert set(bucketed) <= set(exact)
    for pair, cos in bucketed.items():
        assert cos == exact[pair]


def test_ivf_ann_full_probe_equals_exact(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import ivf_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = cosine_topk(emb, query_pred=F.col("vec_id") < 3, k=3).collect()
    full = ivf_ann_topk(
        emb,
        query_pred=F.col("vec_id") < 3,
        n_centroids=4,
        n_probe=4,  # probe every cell -> degrades to exact search
        k=3,
    ).collect()
    exact_set = {(r["q_id"], r["rank"], r["cand_id"]) for r in exact}
    full_set = {(r["q_id"], r["rank"], r["cand_id"]) for r in full}
    assert full_set == exact_set


def test_ivf_pretrained_full_probe_equals_exact(spark):
    """Probing every cell of the pinned quantizer degrades to exact search —
    the same invariant the trained variant holds."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.ivf_centroids import (
        IVF_CENTROIDS,
    )
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        ivf_ann_topk_pretrained,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = cosine_topk(emb, query_pred=F.col("vec_id") < 3, k=3).collect()
    full = ivf_ann_topk_pretrained(
        emb,
        query_pred=F.col("vec_id") < 3,
        centers=IVF_CENTROIDS,
        n_probe=len(IVF_CENTROIDS),  # probe all 16 cells -> exact
        k=3,
    ).collect()
    assert {(r["q_id"], r["rank"], r["cand_id"]) for r in full} == {
        (r["q_id"], r["rank"], r["cand_id"]) for r in exact
    }


def test_ivf_multiprobe_recall_floor_and_monotonicity(spark):
    """Multi-probe IVF: recall@5 vs exact search improves monotonically
    with probe count and the battery's 3-probe setting clears the floor
    measured on the fixed testdata (0.52 at sf0.001 — re-pin if the
    centroids or testdata regenerate)."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.ivf_centroids import (
        IVF_CENTROIDS,
    )
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        ivf_ann_topk_pretrained,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pred = F.col("vec_id") < 10
    exact = {(r["q_id"], r["cand_id"]) for r in cosine_topk(emb, pred, k=5).collect()}

    def recall(n_probe: int) -> float:
        ann = {
            (r["q_id"], r["cand_id"])
            for r in ivf_ann_topk_pretrained(
                emb, pred, IVF_CENTROIDS, n_probe=n_probe, k=5
            ).collect()
        }
        return len(ann & exact) / len(exact)

    r1, r2, r3 = recall(1), recall(2), recall(3)
    assert r1 <= r2 <= r3, (r1, r2, r3)
    assert r3 >= 0.5, r3


def test_ivf_assign_matches_nearest_centroid(spark):
    """Cell assignment picks the argmin-distance centroid with lowest-cell
    tiebreak, computed as a pure expression."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        ivf_assign,
    )

    centers = [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]]  # cell 2 duplicates cell 0
    df = _emb(spark, [(0, [0.9, 0.1]), (1, [0.1, 0.9])])
    got = {
        r["vec_id"]: r["cell"]
        for r in df.select(
            "vec_id",
            ivf_assign(
                F.transform("embedding", lambda x: x.cast("double")), centers
            ).alias("cell"),
        ).collect()
    }
    assert got == {0: 0, 1: 1}  # tie between cells 0 and 2 -> lowest wins


def test_ivf_ann_partial_probe_subset(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import ivf_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = ivf_ann_topk(
        emb, query_pred=F.col("vec_id") < 3, n_centroids=8, n_probe=1, k=3
    ).collect()
    # every query returns <= k ranked candidates from its own probed cell
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) <= 3
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
            range(1, len(rows) + 1)
        )
