"""Round-10 property tests — the boundaries the r9 verdict asked to
pin (task 6), plus the new BPE apply/encode family:

- the SemDeDup Arrow pair kernel's 512-row block-chunk boundary (a pair
  straddling two row blocks must still be found once, upper-triangle in
  GLOBAL row order),
- the winnow packed-min arithmetic at the 2^27 position limit (exact
  int64 round-trip at the extremes; fail-loud past capacity) and
  rightmost-tie selection at window edges,
- BPE apply: the Arrow priority-queue encoder (`bpe_apply_ranks`) must
  segment identically to the relational rank-order passes
  (`_bpe_rounds`) — the equivalence `text_bpe_encode`'s plan rests on —
  and `bpe_encode_stats` must match a pure-Python learn+encode model.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
    WINNOW_POS_BITS,
    _winnow_packed,
    winnow_fingerprints,
)
from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
    semantic_dedup_pairs,
)
from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
    _bpe_rounds,
    bpe_apply_ranks,
    bpe_encode_stats,
)

SETTINGS = dict(
    max_examples=8,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

LIM = 1 << WINNOW_POS_BITS

token = st.sampled_from(["a", "b", "c", "ab", "x1"])
doc = st.lists(token, min_size=1, max_size=20).map(" ".join)


# --- winnow packed-min boundaries --------------------------------------------


def test_winnow_packed_roundtrip_at_extremes(spark):
    """The packing must round-trip (h36, pos) exactly at the corners of
    both fields — h36 at 0 and 2^36−1, pos at 1 and 2^27−1 — through the
    SAME unpack expressions the operator uses (integer div + mod; float
    division would lose low bits past the double mantissa)."""
    h_edge = [0, 1, (1 << 36) - 1, 12_345_678_901]  # all within 36 bits
    p_edge = [1, 2, LIM - 2, LIM - 1]
    rows = [(h, p) for h in h_edge for p in p_edge]
    df = spark.createDataFrame(rows, "h long, pos long")
    got = (
        df.select(
            "h",
            "pos",
            _winnow_packed(F.col("h"), F.col("pos"), F.lit(0)).alias("pk"),
        )
        .select(
            "h",
            "pos",
            F.expr(f"pk div {LIM}").cast("bigint").alias("h_back"),
            (F.lit(LIM - 1) - (F.col("pk") % F.lit(LIM)))
            .cast("bigint")
            .alias("pos_back"),
            F.col("pk"),
        )
        .collect()
    )
    for r in got:
        assert r["h_back"] == r["h"], r
        assert r["pos_back"] == r["pos"], r
        assert 0 <= r["pk"] <= (1 << 63) - 1  # never overflows signed 64
    # ordering property at the boundary: same hash, larger pos packs
    # SMALLER (rightmost-tie wins a min), even at pos = 2^27 - 1
    by = {(r["h"], r["pos"]): r["pk"] for r in got}
    for h in h_edge:
        assert by[(h, LIM - 1)] < by[(h, 1)]
    # different hash dominates any pos difference
    assert by[(1, 1)] < by[((1 << 36) - 1, LIM - 1)]


def test_winnow_packed_capacity_fail_loud(spark):
    """pos >= 2^27 would corrupt the packing silently — the guard must
    raise instead."""
    df = spark.createDataFrame([(7, LIM)], "h long, pos long")
    bad = df.select(
        _winnow_packed(F.col("h"), F.col("pos"), F.lit(42)).alias("pk")
    )
    with pytest.raises(Exception, match="packing capacity"):
        bad.collect()


def test_winnow_rightmost_tie_at_window_edges(spark):
    """All-identical grams: every w-window holds ONE hash tied at every
    position including both window edges — the paper's rule selects the
    RIGHTMOST, so the fingerprint positions must be exactly the window
    right-edges w..m (never 1..m−w+1, which a leftmost tie-break or an
    argmin-by-hash-only would produce)."""
    k, w = 2, 3
    n_tok = 8  # m = 7 grams, windows select pos 3..7
    text = " ".join(["a"] * n_tok)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = {(r["pos"], r["fp"]) for r in winnow_fingerprints(df, k=k, w=w).collect()}
    h36 = int(hashlib.md5(b"a a").hexdigest()[:9], 16)
    m = n_tok - k + 1
    assert got == {(p, h36) for p in range(w, m + 1)}


# --- SemDeDup Arrow kernel: 512-row block-chunk boundary ---------------------


def test_semdedup_pairs_across_block_boundary(spark):
    """The kernel scores cells in 512-row blocks; pairs whose rows fall
    in DIFFERENT blocks (e.g. rows 511 and 512) and the global
    upper-triangle keep `(s0+ai) < bi` must behave identically to a
    single-block scan. 515 vectors in one cell, model = the same
    dim-ordered accumulation + floor rounding, no chunking."""
    rng = np.random.default_rng(7)
    n, dim = 515, 3
    M = rng.normal(size=(n, dim))
    # plant exact duplicates straddling the 512 boundary: rows 510&513,
    # 511&512 — and one inside-block pair 4&5
    M[513] = M[510]
    M[512] = M[511]
    M[5] = M[4]
    centers = [[0.0, 0.0, 0.0]]  # single cell
    rows = [(i, [float(x) for x in M[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thresh, dp = 0.999, 6
    got = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in semantic_dedup_pairs(
            df, centers, threshold=thresh, round_dp=dp
        ).collect()
    }

    # reference model — identical arithmetic, one block
    nsq = np.zeros(n)
    for d in range(dim):
        nsq += M[:, d] * M[:, d]
    nrm = np.sqrt(nsq)
    acc = np.zeros((n, n))
    for d in range(dim):
        acc += M[:, d, None] * M[None, :, d]
    cos = acc / np.outer(nrm, nrm)
    cos = np.floor(cos * 1e6 + 0.5) / 1e6
    want = {
        (a, b, cos[a, b])
        for a in range(n)
        for b in range(a + 1, n)
        if cos[a, b] >= thresh
    }
    assert got == want
    # the planted straddling pairs are present
    for pair in [(510, 513), (511, 512), (4, 5)]:
        assert any((a, b) == pair for a, b, _ in got), pair


# --- BPE apply/encode --------------------------------------------------------


def _py_bpe(word_counts: dict[str, int], rounds: int):
    """Reference BPE trainer+segmenter (greedy leftmost merge per rule,
    ties by (count desc, pair asc)) — mirrors test_properties_round9's
    model but also returns the final segmentation."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(rounds):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = (
                    pc.get((syms[i], syms[i + 1]), 0) + word_counts[w]
                )
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@settings(**SETTINGS)
@given(st.lists(doc, min_size=1, max_size=5))
def test_bpe_apply_ranks_matches_relational_segmentation(spark, texts):
    """The Arrow priority-queue encoder and the relational rank-order
    passes must produce the IDENTICAL segmentation — the equivalence
    (rule k only creates rank-k symbols, so no rule j<k re-applies)
    that lets text_bpe_encode stay relational."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_df, seg = _bpe_rounds(df, rounds=3)
    merge_list = [
        (r["left_sym"], r["right_sym"])
        for r in merges_df.orderBy("round").collect()
    ]
    rel = {
        (r["word"], r["pos"], r["sym"]) for r in seg.collect()
    }
    words = seg.select("word").distinct()
    arrow = {
        (r["word"], r["pos"], r["sym"])
        for r in bpe_apply_ranks(words, merge_list).collect()
    }
    assert arrow == rel


@settings(**SETTINGS)
@given(st.lists(doc, min_size=1, max_size=5))
def test_bpe_encode_stats_model_agreement(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    _, vocab = _py_bpe(wc, 3)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_char_tokens"])
        for r in bpe_encode_stats(df, rounds=3).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        if not words:
            assert i not in got
            continue
        segs = [vocab[w] for w in words]
        want = (
            len(words),
            sum(len(s) for s in segs),
            sum(1 for s in segs for sym in s if len(sym) == 1),
        )
        assert got[i] == want, (i, got[i], want)


# --- retrieval kernels (r10): randomized model parity -------------------------


def _rrf_model(legs, k=10, k_rrf=60):
    from collections import defaultdict

    score, nleg = defaultdict(int), defaultdict(int)
    for leg in legs:
        for q, c, r in leg:
            score[(q, c)] += 1_000_000 // (k_rrf + r)
            nleg[(q, c)] += 1
    byq = defaultdict(list)
    for (q, c), s in score.items():
        byq[q].append((-s, c))
    out = set()
    for q, rows in byq.items():
        for i, (negs, c) in enumerate(sorted(rows)[:k], start=1):
            out.add((q, i, c, -negs, nleg[(q, c)]))
    return out


@settings(**SETTINGS)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 2),    # q_id
                st.integers(10, 25),  # cand_id
                st.integers(1, 9),    # rank
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_rrf_fuse_model_agreement_random_legs(spark, legs):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.retrieval import rrf_fuse

    # dedup (q, cand) within a leg — a real leg ranks a candidate once
    legs = [list({(q, c): (q, c, r) for q, c, r in leg}.values()) for leg in legs]
    dfs = [
        spark.createDataFrame(leg, "q_id long, cand_id long, rank int")
        for leg in legs
    ]
    got = {
        (r["q_id"], r["rank"], r["cand_id"], r["rrf_e6"], r["n_legs"])
        for r in rrf_fuse(dfs, k=10).collect()
    }
    assert got == _rrf_model(legs, k=10)


vec3 = st.lists(
    st.integers(-10, 10).map(lambda x: x / 10.0), min_size=3, max_size=3
).filter(lambda v: any(x != 0 for x in v))


@settings(**SETTINGS)
@given(st.lists(vec3, min_size=3, max_size=8, unique_by=tuple))
def test_mmr_model_agreement_random_vectors(spark, vs):
    """Randomized MMR parity vs the reference greedy model — exercises
    integer tie-breaks and negative-cosine scores the deterministic
    test can't reach."""
    import math

    from sports_data_integration_and_forecasting_pipeline_spark.operators.retrieval import (
        mmr_rerank_topk,
    )
    from .test_retrieval import _mmr_model

    rows = [(i, v) for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n_cand = min(4, len(vs) - 1)
    k = min(3, n_cand)
    got = sorted(
        (r["mmr_rank"], r["cand_id"], r["score_e7"])
        for r in mmr_rerank_topk(
            df, F.col("vec_id") == 0, n_cand=n_cand, k=k
        ).collect()
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.floor(d / (na * nb) * 1e6 + 0.5)

    cands = list(range(1, len(vs)))
    rel_all = {c: cos(vs[0], vs[c]) for c in cands}
    top = sorted(cands, key=lambda c: (-rel_all[c], c))[:n_cand]
    rel = {c: rel_all[c] for c in top}
    sims = {
        (a, b): cos(vs[a], vs[b]) for a in top for b in top if a != b
    }
    want = sorted(_mmr_model(rel, sims, k))
    assert got == want
