"""Winnowing fingerprints (MOSS) — operator vs a pure-Python reference
model of Schleimer et al.'s algorithm, plus the paper's guarantee."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
    WINNOW_POS_BITS,
    winnow_fingerprints,
    winnow_match_pairs,
)

LIM = 1 << WINNOW_POS_BITS


def _h36(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:9], 16)


def _model(text: str, k: int, w: int) -> set[tuple[int, int]]:
    toks = text.split(" ")
    grams = [
        (i + 1, _h36(" ".join(toks[i : i + k])))
        for i in range(len(toks) - k + 1)
    ]
    m = len(grams)
    if m == 0:
        return set()
    out = set()
    for start in range(1, max(m - w + 1, 1) + 1):
        window = grams[start - 1 : start - 1 + w]
        # min hash, rightmost on ties — exactly the packed-integer rule
        best = min(window, key=lambda pg: pg[1] * LIM + (LIM - 1 - pg[0]))
        out.add(best)
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_winnow_matches_reference_model(spark):
    texts = [
        "a b c d e f g h i j k l m",
        "z y x w v u t s r q p",
        "a b c d e",          # m = 1 gram at k=5: one clamped window
        "a b c",              # shorter than k: no fingerprints
        "r r r r r r r r",    # all-equal hashes: rightmost-tie exercised
    ]
    k, w = 5, 4
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(_docs(spark, texts), k=k, w=w).collect()
    }
    want = {
        (i, pos, h)
        for i, t in enumerate(texts)
        for (pos, h) in _model(t, k, w)
    }
    assert got == want


def test_winnow_rightmost_tie_rule(spark):
    # identical grams throughout -> every window's min is its RIGHTMOST
    # element; selected positions are w, w+1, ..., m (plus none earlier)
    text = " ".join(["t"] * 10)  # k=3 -> 8 grams
    out = winnow_fingerprints(_docs(spark, [text]), k=3, w=4).collect()
    assert sorted(r["pos"] for r in out) == [4, 5, 6, 7, 8]


def test_winnow_guarantee_shared_substring(spark):
    """Any shared run of >= w + k - 1 tokens yields >= 1 shared
    fingerprint (the paper's detection guarantee)."""
    k, w = 4, 3
    shared = " ".join(f"s{i}" for i in range(k + w - 1))
    a = "a1 a2 a3 " + shared + " a4"
    b = "b1 " + shared + " b2 b3 b4"
    fa = {r["fp"] for r in winnow_fingerprints(_docs(spark, [a]), k=k, w=w).collect()}
    fb = {r["fp"] for r in winnow_fingerprints(_docs(spark, [b]), k=k, w=w).collect()}
    assert fa & fb


def test_winnow_match_pairs_and_hot_cap(spark):
    k, w = 4, 3
    shared = " ".join(f"s{i}" for i in range(12))
    texts = [
        "a0 a1 " + shared,
        shared + " b0 b1",
        "c0 c1 c2 c3 c4 c5 c6 c7 c8",
    ]
    out = winnow_match_pairs(
        _docs(spark, texts), k=k, w=w, min_shared=1, max_df=None
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert pairs == {(0, 1)}
    # hot cap: a fingerprint in EVERY doc is dropped before the join
    texts_hot = [shared + f" u{i}" for i in range(5)]
    hot_out = winnow_match_pairs(
        _docs(spark, texts_hot), k=k, w=w, min_shared=1, max_df=4
    )
    full_out = winnow_match_pairs(
        _docs(spark, texts_hot), k=k, w=w, min_shared=1, max_df=None
    )
    assert hot_out.count() < full_out.count()


def test_winnow_guards(spark):
    df = _docs(spark, ["a b c"])
    with pytest.raises(ValueError, match="k must be >= 2"):
        winnow_fingerprints(df, k=1)
    with pytest.raises(ValueError, match="w must be >= 1"):
        winnow_fingerprints(df, w=0)
