"""Product quantization (encode + ADC top-k) vs a numpy reference
model, plus the tie rule and the integer-snapping contract."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.pq_codebooks import (
    PQ_CODEBOOKS,
    PQ_K,
    PQ_M,
    PQ_SUB_DIM,
)
from sports_data_integration_and_forecasting_pipeline_spark.operators.quantize import (
    pq_adc_topk,
    pq_encode,
)

SF = "/root/testdata/sf0.001"


def _np_encode(vec: np.ndarray) -> list[int]:
    codes = []
    for s, book in enumerate(PQ_CODEBOOKS):
        sub = vec[s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM]
        d = [float(np.sum((sub - np.asarray(c)) ** 2)) for c in book]
        codes.append(int(np.argmin(d)))  # argmin takes first == lowest code
    return codes


def test_pq_codebook_shape():
    assert len(PQ_CODEBOOKS) == PQ_M == 4
    assert all(len(b) == PQ_K == 16 for b in PQ_CODEBOOKS)
    assert all(len(c) == PQ_SUB_DIM == 16 for b in PQ_CODEBOOKS for c in b)


def test_pq_encode_matches_numpy_model(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    got = {
        r["vec_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in pq_encode(emb, PQ_CODEBOOKS).collect()
    }
    for vid, vec in rows.items():
        assert got[vid] == _np_encode(vec), vid
    assert all(0 <= c < PQ_K for cs in got.values() for c in cs)


def test_pq_encode_tie_breaks_to_lowest_code(spark):
    # two identical centroids -> exact tie -> code 0
    books = [[[0.0, 0.0], [0.0, 0.0]], [[1.0, 1.0], [2.0, 2.0]]]
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 2.0, 2.0])], "vec_id long, embedding array<double>"
    )
    r = pq_encode(df, books).collect()[0]
    assert (r["c0"], r["c1"]) == (0, 1)


def test_pq_adc_matches_numpy_model(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = pq_adc_topk(
        emb, query_pred=F.col("vec_id") < 3, codebooks=PQ_CODEBOOKS, k=5
    ).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}

    def adc(qid, cid):
        q = vecs[qid]
        codes = _np_encode(vecs[cid])
        tot = 0
        for s, code in enumerate(codes):
            sub = q[s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM]
            d2 = float(np.sum((sub - np.asarray(PQ_CODEBOOKS[s][code])) ** 2))
            tot += math.floor(d2 * 1e6 + 0.5)
        return tot

    assert out  # query ids exist in the table
    for r in out:
        assert r["adc_e6"] == adc(r["q_id"], r["cand_id"]), (
            r["q_id"], r["cand_id"])
    # ranks are 1..5 per query, ascending distance
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["adc_e6"]))
    for q, rs in by_q.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i][1] <= rs[i + 1][1] for i in range(len(rs) - 1))


def test_pq_adc_exact_float_sum_would_drift(spark):
    """The reason the snapping happens BEFORE the sum: per-subspace
    integer entries make the total independent of addition order —
    summing floats then snapping is not oracle-portable."""
    # the numpy model in test_pq_adc_matches_numpy_model IS the spec;
    # here just pin that adc_e6 is an exact integer column (bigint)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100)
    sch = dict(pq_adc_topk(
        emb, query_pred=F.col("vec_id") < 2, codebooks=PQ_CODEBOOKS, k=3
    ).dtypes)
    assert sch["adc_e6"] == "bigint" and sch["rank"] == "int"


def test_ivfpq_candidates_only_from_probed_cells(spark):
    """Every returned candidate sits in one of its query's n_probe
    nearest cells, and ADC values match the flat-ADC path (cell pruning
    must change WHICH candidates are scored, never their distance)."""
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
    from sports_data_integration_and_forecasting_pipeline_spark.operators.quantize import ivfpq_topk
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        ivf_assign,
        ivf_cell_structs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = ivfpq_topk(
        emb, query_pred=F.col("vec_id") < 3, centers=IVF_CENTROIDS,
        codebooks=PQ_CODEBOOKS, n_probe=3, k=5,
    ).collect()
    assert out
    v = F.transform("embedding", lambda x: x.cast("double"))
    probes = {
        r["vec_id"]: [p["cell"] for p in r["ps"][:3]]
        for r in emb.filter(F.col("vec_id") < 3).select(
            "vec_id",
            F.array_sort(ivf_cell_structs(v, IVF_CENTROIDS)).alias("ps"),
        ).collect()
    }
    cells = {
        r["vec_id"]: r["cell"]
        for r in emb.select(
            "vec_id", ivf_assign(v, IVF_CENTROIDS).alias("cell")
        ).collect()
    }
    from sports_data_integration_and_forecasting_pipeline_spark.operators.quantize import pq_adc_topk

    flat = {
        (r["q_id"], r["cand_id"]): r["adc_e6"]
        for r in pq_adc_topk(
            emb, query_pred=F.col("vec_id") < 3,
            codebooks=PQ_CODEBOOKS, k=10**9,
        ).collect()
    }
    for r in out:
        assert r["cell"] == cells[r["cand_id"]]
        assert r["cell"] in probes[r["q_id"]]
        assert flat[(r["q_id"], r["cand_id"])] == r["adc_e6"]


def test_ivfpq_precoded_matches_inline(spark, tmp_path):
    """The stored-column split (ivfpq_index_codes materialized to
    parquet, queried via ivfpq_topk_precoded) must return EXACTLY the
    inline ivfpq_topk result — precoding changes where encode cost is
    paid, never the answer."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
    from sports_data_integration_and_forecasting_pipeline_spark.operators.quantize import (
        ivfpq_index_codes,
        ivfpq_topk,
        ivfpq_topk_precoded,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pred = F.col("vec_id") < 4
    inline = {
        tuple(r)
        for r in ivfpq_topk(
            emb, query_pred=pred, centers=IVF_CENTROIDS,
            codebooks=PQ_CODEBOOKS, n_probe=3, k=5,
        ).collect()
    }
    idx_path = str(tmp_path / "pq_index")
    ivfpq_index_codes(emb, IVF_CENTROIDS, PQ_CODEBOOKS).write.parquet(idx_path)
    enc = spark.read.parquet(idx_path)
    assert set(enc.columns) == {"vec_id", "cell", "c0", "c1", "c2", "c3"}
    precoded = {
        tuple(r)
        for r in ivfpq_topk_precoded(
            enc, emb.filter(pred), centers=IVF_CENTROIDS,
            codebooks=PQ_CODEBOOKS, n_probe=3, k=5,
        ).collect()
    }
    assert precoded == inline and precoded


def test_ivfpq_refine_subset_and_recall_lift(spark):
    """The refine stage re-ranks WITHIN the stage-1 shortlist (subset
    invariant) and must not lose exact-cosine recall vs the raw IVF-PQ
    ranking at the same probe budget (the reason the stage exists —
    measured 0.12 -> 0.40 recall@5 at sf0.01 on arrival)."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
    from sports_data_integration_and_forecasting_pipeline_spark.operators.quantize import (
        ivfpq_refine_topk,
        ivfpq_topk,
    )
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pred = F.col("vec_id") < 5
    kw = dict(centers=IVF_CENTROIDS, codebooks=PQ_CODEBOOKS, n_probe=3)
    short = ivfpq_topk(emb, pred, k=20, **kw).collect()
    ref = ivfpq_refine_topk(emb, pred, shortlist=20, k=5, **kw).collect()
    ivf = ivfpq_topk(emb, pred, k=5, **kw).collect()
    exact = cosine_topk(emb, pred, k=5).collect()

    short_pairs = {(r["q_id"], r["cand_id"]) for r in short}
    assert all((r["q_id"], r["cand_id"]) in short_pairs for r in ref)
    # adc_rank is the candidate's true stage-1 position
    srank = {(r["q_id"], r["cand_id"]): r["rank"] for r in short}
    assert all(srank[(r["q_id"], r["cand_id"])] == r["adc_rank"] for r in ref)
    # per query: ranks are 1..n and cosine is non-increasing in rank
    by_q = {}
    for r in ref:
        by_q.setdefault(r["q_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert all(
            a["cosine"] >= b["cosine"] for a, b in zip(rows, rows[1:])
        )
    ex = {(r["q_id"], r["cand_id"]) for r in exact}
    rec_ref = sum((r["q_id"], r["cand_id"]) in ex for r in ref)
    rec_ivf = sum((r["q_id"], r["cand_id"]) in ex for r in ivf)
    assert rec_ref >= rec_ivf


def test_ivfpq_refine_shortlist_below_k_degrades(spark):
    """shortlist < k yields fewer rows per query, never an error (the
    degenerate-input arrival discipline)."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
    from sports_data_integration_and_forecasting_pipeline_spark.operators.quantize import (
        ivfpq_refine_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = ivfpq_refine_topk(
        emb,
        F.col("vec_id") < 3,
        centers=IVF_CENTROIDS,
        codebooks=PQ_CODEBOOKS,
        shortlist=2,
        k=5,
    ).collect()
    per_q = {}
    for r in out:
        per_q[r["q_id"]] = per_q.get(r["q_id"], 0) + 1
    assert per_q and all(n <= 2 for n in per_q.values())
