"""Round-13 property tests — model parity + degenerate-input coverage
for the three r13 additions (the standing arrival convention: any entry
that divides by a count or aggregates over a possibly-empty side ships
WITH its one-sided/empty case):

- ``near_dup_soft_weights`` must agree with a pure-Python union-find
  over the SAME SimHash pair edges (cluster membership, sizes, and the
  1e6-DIV-size weights), exact duplicates must share one cluster, and
  a pairless corpus must yield all-singleton weights of exactly 1e6.
- ``embedding_contamination_audit`` must match a numpy reference on
  integer-valued vectors (exact dot products — no fold-order hazard),
  including the min-id tie-break, and must DEGRADE on zero-norm
  vectors (NULL cosine drops from count/max/nearest, never a division
  error) and on an empty benchmark side (0 rows).
- ``bpe_vocab_coverage_stats`` must match the round-10 pure-Python BPE
  reference's word classes in BOTH the type and occurrence bases, the
  three classes must partition every group exactly, and a group with no
  non-empty words must be absent (the bpe_encode_stats convention).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
    near_dup_soft_weights,
    simhash_pairs,
)
from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
    embedding_contamination_audit,
)
from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
    bpe_vocab_coverage_stats,
)
from tests.test_properties_round10 import _py_bpe

SETTINGS = dict(
    max_examples=8,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# --- near-dup soft weights vs union-find over the same edges -----------------

token = st.sampled_from(["alpha", "beta", "gamma", "delta", "x9"])
doc = st.lists(token, min_size=3, max_size=12).map(" ".join)


@settings(**SETTINGS)
@given(st.lists(doc, min_size=1, max_size=8))
def test_near_dup_soft_weights_match_union_find(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    edges = [
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(df, max_hamming=3).collect()
    ]
    parent = {i: i for i in range(len(texts))}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, list[int]] = {}
    for i in range(len(texts)):
        clusters.setdefault(find(i), []).append(i)
    want = {}
    for members in clusters.values():
        cid, size = min(members), len(members)
        for m in members:
            want[m] = (cid, size, 1_000_000 // size)
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["weight_e6"])
        for r in near_dup_soft_weights(df).collect()
    }
    assert got == want


def test_near_dup_soft_weights_exact_dups_and_singletons(spark):
    # two identical texts (Hamming 0 — always paired) + one unrelated
    df = spark.createDataFrame(
        [
            (1, "same text twice here ok"),
            (2, "same text twice here ok"),
            (3, "zz qq ww ee rr tt yy uu"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["weight_e6"])
        for r in near_dup_soft_weights(df).collect()
    }
    assert got[1] == (1, 2, 500_000)
    assert got[2] == (1, 2, 500_000)
    assert got[3][1:] == (1, 1_000_000)  # singleton keeps exactly 1e6


def test_near_dup_soft_weights_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert near_dup_soft_weights(df).count() == 0


# --- embedding contamination vs numpy reference ------------------------------

vec = st.lists(st.integers(-3, 3), min_size=4, max_size=4)


@settings(**SETTINGS)
@given(st.lists(vec, min_size=3, max_size=10))
def test_contamination_matches_reference(spark, vecs):
    thr = 0.5
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["bench_id"]: (r["n_flagged"], r["max_cosine"], r["nearest_id"])
        for r in embedding_contamination_audit(
            df,
            bench_pred=F.col("vec_id") < 2,
            threshold=thr,
            round_expr=lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6,
        ).collect()
    }
    bench = {i: v for i, v in enumerate(vecs) if i < 2}
    train = {i: v for i, v in enumerate(vecs) if i >= 2}
    want = {}
    for b, bv in bench.items():
        nb = math.sqrt(sum(x * x for x in bv))
        scored = []
        for t, tv in train.items():
            nt = math.sqrt(sum(x * x for x in tv))
            if nb > 0 and nt > 0:
                scored.append((t, _r6(sum(x * y for x, y in zip(bv, tv)) / (nb * nt))))
        n_flagged = sum(1 for _, c in scored if c >= thr)
        if scored:
            mx = max(c for _, c in scored)
            nearest = min(t for t, c in scored if c == mx)
            want[b] = (n_flagged, mx, nearest)
        else:
            want[b] = (0, None, None)
    assert got == want


def test_contamination_degrades_on_zero_norms_and_empty_bench(spark):
    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0, 0.0]),  # zero-norm bench vector
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero-norm train vector
            (3, [1.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["bench_id"]: (r["n_flagged"], r["max_cosine"], r["nearest_id"])
        for r in embedding_contamination_audit(
            df, bench_pred=F.col("vec_id") < 2, threshold=0.9
        ).collect()
    }
    # zero-norm bench: every cosine NULL -> 0 flagged, NULL max/nearest
    assert got[0] == (0, None, None)
    # valid bench: the zero-norm train vector drops; id 3 is identical
    n, mx, near = got[1]
    assert (n, near) == (1, 3) and abs(mx - 1.0) < 1e-9
    # empty benchmark side -> 0 rows, never an error
    assert (
        embedding_contamination_audit(
            df, bench_pred=F.col("vec_id") < 0
        ).count()
        == 0
    )


# --- BPE vocab coverage vs the round-10 python reference ---------------------

word = st.sampled_from(["aa", "ab", "ba", "abab", "z", "qq"])
gdoc = st.tuples(
    st.sampled_from(["en", "de"]),
    st.lists(word, min_size=0, max_size=8).map(" ".join),
)


@settings(**SETTINGS)
@given(st.lists(gdoc, min_size=1, max_size=6))
def test_vocab_coverage_matches_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, lang, t) for i, (lang, t) in enumerate(docs)],
        "doc_id long, lang string, text string",
    )
    wc: dict[str, int] = {}
    for _, t in docs:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    _, vocab = _py_bpe(wc, 3)
    per_lang: dict[str, dict[str, int]] = {}
    for lang, t in docs:
        for w in t.split(" "):
            if w:
                per_lang.setdefault(lang, {})[w] = (
                    per_lang.get(lang, {}).get(w, 0) + 1
                )
    want = {}
    for lang, occs in per_lang.items():
        n_types = len(occs)
        n_occ = sum(occs.values())
        wt = ft = wo = fo = 0
        for w, occ in occs.items():
            segs = vocab[w]
            whole = len(segs) == 1
            fb = len(segs) > 1 and all(len(s) == 1 for s in segs)
            wt += whole
            ft += fb
            wo += occ * whole
            fo += occ * fb
        want[lang] = (
            n_types,
            n_occ,
            1_000_000 * wt // n_types,
            1_000_000 * ft // n_types,
            1_000_000 * wo // n_occ,
            1_000_000 * fo // n_occ,
        )
    got = {
        r["lang"]: (
            r["n_types"],
            r["n_occurrences"],
            r["whole_type_e6"],
            r["fallback_type_e6"],
            r["whole_occ_e6"],
            r["fallback_occ_e6"],
        )
        for r in bpe_vocab_coverage_stats(df, rounds=3).collect()
    }
    assert got == want  # a lang with no non-empty words is absent BOTH sides


def test_vocab_coverage_classes_partition_and_bounds(spark):
    df = spark.createDataFrame(
        [
            (1, "en", "aa aa ab z"),
            (2, "de", "z z z"),
            (3, "fr", ""),  # no non-empty words -> absent
        ],
        "doc_id long, lang string, text string",
    )
    rows = bpe_vocab_coverage_stats(df, rounds=2).collect()
    langs = {r["lang"] for r in rows}
    assert "fr" not in langs and {"en", "de"} <= langs
    for r in rows:
        # each class share is a valid micro-unit and they never overlap
        for c in ("whole_type_e6", "fallback_type_e6", "whole_occ_e6",
                  "fallback_occ_e6"):
            assert 0 <= r[c] <= 1_000_000
        assert r["whole_type_e6"] + r["fallback_type_e6"] <= 1_000_000
        assert r["whole_occ_e6"] + r["fallback_occ_e6"] <= 1_000_000


def test_prefix_pairs_hot_cap_boundary(spark):
    """Hot-cap boundary contract of ``shingle_jaccard_prefix_pairs``,
    independent of the candidate-stage implementation: a shingle shared
    by EXACTLY ``max_df`` docs survives the cap and all C(m,2) pairs
    are enumerated; one doc past the cap drops the shingle entirely and
    every pair with it. (An r13 posting-list candidate-stage rewrite
    was measured and rejected — commits 9936891/5dcbcb5 — the shipped
    path is the prefix self-join; this boundary pin held across both.)"""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        shingle_jaccard_prefix_pairs,
    )

    rows = [(i, "alpha beta gamma delta") for i in range(6)]  # df == cap
    rows += [(100 + i, "pq rs tu vw") for i in range(8)]  # df > cap
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in shingle_jaccard_prefix_pairs(df, max_df=6).collect()
    }
    want = {(a, b) for a in range(6) for b in range(a + 1, 6)}
    assert set(got) == want  # all 15 at-cap pairs, zero past-cap pairs
    assert all(j == 1.0 for j in got.values())  # identical docs


def test_hard_negatives_skip_band_and_numpy_parity(spark):
    """r13 ``hard_negative_topk``: integer-valued vectors (exact dot
    products, no fold-order hazard) checked against a numpy reference —
    candidates at/above the threshold are SKIPPED, the best
    sub-threshold candidates rank first, ties break on cand_id."""
    import numpy as np

    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        hard_negative_topk,
    )

    vecs = {
        0: [4.0, 0.0],   # anchor
        1: [4.0, 0.0],   # exact duplicate -> cosine 1.0, skipped
        2: [3.0, 1.0],   # near-positive (cos ~0.95), skipped at 0.9
        3: [1.0, 1.0],   # hard negative (cos ~0.707)
        4: [0.0, 2.0],   # orthogonal (cos 0)
        5: [-1.0, 0.0],  # opposite (cos -1)
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = [
        (r["rank"], r["cand_id"], r["cosine"])
        for r in hard_negative_topk(
            df, F.col("vec_id") == 0, k=3, pos_threshold=0.9
        ).collect()
    ]
    a = np.array(vecs[0])
    want = sorted(
        (
            (-float(np.dot(a, np.array(v)) / (np.linalg.norm(a) * np.linalg.norm(np.array(v)))), i)
            for i, v in vecs.items()
            if i != 0
        ),
    )
    want = [(-c, i) for c, i in want if -c < 0.9][:3]
    assert [(cid, round(cos, 9)) for _, cid, cos in got] == [
        (i, round(c, 9)) for c, i in want
    ]
    assert [r for r, _, _ in got] == [1, 2, 3]
    assert {cid for _, cid, _ in got} == {3, 4, 5}  # 1 and 2 skipped


def test_hard_negatives_zero_norm_and_all_excluded_degrade(spark):
    """Zero-norm vectors get NULL cosine (dropped by the strict <, never
    a division error); an anchor whose every candidate clears the
    threshold returns no rows; a zero-norm ANCHOR returns no rows."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        hard_negative_topk,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 0.0]),  # zero-norm candidate
            (2, [2.0, 0.0]),  # cosine 1.0
        ],
        "vec_id long, embedding array<double>",
    )
    got = hard_negative_topk(
        df, F.col("vec_id") == 0, k=5, pos_threshold=0.5
    ).collect()
    assert got == []  # cand 1 NULL-dropped, cand 2 above threshold
    # zero-norm anchor: every cosine NULL -> no rows, no error
    got2 = hard_negative_topk(
        df, F.col("vec_id") == 1, k=5, pos_threshold=0.5
    ).collect()
    assert got2 == []
