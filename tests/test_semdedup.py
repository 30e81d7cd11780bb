"""SemDeDup (cluster-scoped semantic dedup): keep-list invariants,
the star resolution rule, and cell scoping."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
    semantic_dedup_keep,
    semantic_dedup_pairs,
)

SF = "/root/testdata/sf0.001"


def test_semdedup_keep_invariants(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = semantic_dedup_keep(emb, IVF_CENTROIDS, threshold=0.35).collect()
    assert len(out) == emb.count()  # every vector labeled
    for r in out:
        assert r["canonical_id"] <= r["vec_id"]
        assert r["is_kept"] == (r["canonical_id"] == r["vec_id"])
    # at least one vector is kept, canonical ids are themselves vectors
    ids = {r["vec_id"] for r in out}
    assert all(r["canonical_id"] in ids for r in out)
    assert any(r["is_kept"] for r in out)


def test_semdedup_star_rule_on_chain(spark):
    """a~b and b~c but NOT a~c (cosine chain): the star rule resolves
    b -> a and c -> b — the documented difference from the full
    connected-components closure."""
    import math

    th = math.radians(36.8698976458)  # cos = 0.8, cos(2*th) ~ 0.28
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [math.cos(th), math.sin(th), 0.0, 0.0]),
        (3, [math.cos(2 * th), math.sin(2 * th), 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one_cell = [[0.0, 0.0, 0.0, 0.0]]
    pairs = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(df, one_cell, threshold=0.5).collect()
    }
    assert pairs == {(1, 2), (2, 3)}
    keep = {
        r["vec_id"]: (r["canonical_id"], r["is_kept"])
        for r in semantic_dedup_keep(df, one_cell, threshold=0.5).collect()
    }
    assert keep == {1: (1, True), 2: (1, False), 3: (2, False)}


def test_semdedup_pairs_are_cell_scoped(spark):
    """Two identical vectors in different cells are never paired —
    cluster scoping is the algorithm's contract (and its cost bound)."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),   # identical, but nearest centers differ below
        (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # centers chosen so vec 1/2 share a cell, 3 is alone
    centers = [[1.0, 0.0], [-1.0, 0.0]]
    pairs = semantic_dedup_pairs(df, centers, threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert all(r["cell"] == 0 for r in pairs)


def test_semdedup_kernel_bit_exact_vs_sequential_fold(spark):
    """The Arrow kernel's dim-ordered accumulation performs the IDENTICAL
    left-to-right additions as the sequential fold — verified against a
    pure-Python model (same order, same rounding) on real data."""
    import math

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_dedup_pairs(
            emb, IVF_CENTROIDS, threshold=0.35
        ).collect()
    }
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}

    def cell(v):
        best = None
        for i, c in enumerate(IVF_CENTROIDS):
            d = 0.0
            for a, b in zip(v, c):
                d = d + (a - b) * (a - b)
            if best is None or d < best[0]:
                best = (d, i)
        return best[1]

    def seq_cos(u, v):
        duv = 0.0
        du = 0.0
        dv = 0.0
        for a, b in zip(u, v):
            duv = duv + a * b
        for a in u:
            du = du + a * a
        for b in v:
            dv = dv + b * b
        return math.floor(duv / (math.sqrt(du) * math.sqrt(dv)) * 1e6 + 0.5) / 1e6

    cells = {vid: cell(v) for vid, v in vecs.items()}
    want = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if cells[a] != cells[b]:
                continue
            c = seq_cos(vecs[a], vecs[b])
            if c >= 0.35:
                want[(a, b)] = c
    assert got == want


def test_semdedup_cell_bound_fails_loudly(spark):
    rows = [(i, [1.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    import pytest as _pt

    with _pt.raises(Exception, match="finer quantizer"):
        semantic_dedup_pairs(
            df, [[1.0, 0.0]], threshold=0.0, max_cell_rows=3
        ).collect()
