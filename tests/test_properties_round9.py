"""Property-based tests (hypothesis) for the round-9 operator families —
winnowing, CDC, and BPE each carry a pure-Python reference model; these
drive random inputs through both and assert exact agreement plus the
papers' guarantees (the house property-test discipline of
test_properties.py, extended to the new kernels)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
    WINNOW_POS_BITS,
    winnow_fingerprints,
)
from sports_data_integration_and_forecasting_pipeline_spark.operators.multimodal import cdc_chunks
from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import bpe_merge_rounds

SETTINGS = dict(
    max_examples=8,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

LIM = 1 << WINNOW_POS_BITS

# small token alphabet makes repeats (the interesting case) likely
token = st.sampled_from(["a", "b", "c", "ab", "x1"])
doc = st.lists(token, min_size=1, max_size=24).map(" ".join)


def _h36(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:9], 16)


def _winnow_model(text: str, k: int, w: int) -> set[tuple[int, int]]:
    toks = text.split(" ")
    grams = [
        (i + 1, _h36(" ".join(toks[i : i + k])))
        for i in range(len(toks) - k + 1)
    ]
    m = len(grams)
    if m == 0:
        return set()
    out = set()
    for s in range(1, max(m - w + 1, 1) + 1):
        win = grams[s - 1 : s - 1 + w]
        out.add(min(win, key=lambda pg: pg[1] * LIM + (LIM - 1 - pg[0])))
    return out


@settings(**SETTINGS)
@given(st.lists(doc, min_size=1, max_size=6))
def test_winnow_model_agreement_random_docs(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=3, w=3).collect()
    }
    want = {
        (i, p, h)
        for i, t in enumerate(texts)
        for (p, h) in _winnow_model(t, 3, 3)
    }
    assert got == want


@settings(**SETTINGS)
@given(st.lists(doc, min_size=2, max_size=4), st.integers(0, 3))
def test_winnow_guarantee_random_shared_run(spark, texts, offset):
    """Schleimer et al.'s guarantee on random data: plant a shared run
    of w+k-1 tokens into two docs at different offsets — they must share
    at least one fingerprint."""
    k, w = 3, 3
    shared = " ".join(f"s{i}" for i in range(k + w - 1))
    a = " ".join(texts[0].split(" ")[:offset] + [shared])
    b = shared + " " + texts[1]
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    fps = winnow_fingerprints(df, k=k, w=w).collect()
    f0 = {r["fp"] for r in fps if r["doc_id"] == 0}
    f1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    assert f0 & f1


def _cdc_model(pl: bytes, w: int = 8, m: int = 6):
    hx = pl.hex().upper()
    bts = [hx[i : i + 2] for i in range(0, len(hx), 2)]
    g = [
        int(hashlib.md5(f"gear-{b}".encode()).hexdigest()[:13], 16)
        for b in bts
    ]
    bd = [
        i + 1 >= w
        and sum(g[i - j] * (1 << j) for j in range(w)) % (1 << m) == 0
        for i in range(len(bts))
    ]
    chunks, start = [], 0
    for i, b in enumerate(bd):
        if b:
            chunks.append((start, i + 1 - start))
            start = i + 1
    if start < len(bts):
        chunks.append((start, len(bts) - start))
    return [
        (ci + 1, s + 1, n, hashlib.md5(hx[s * 2 : (s + n) * 2].encode()).hexdigest())
        for ci, (s, n) in enumerate(chunks)
    ]


@settings(**SETTINGS)
@given(st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=4))
def test_cdc_model_agreement_random_payloads(spark, payloads):
    # min_size=0 (ADVICE r9): a zero-length payload must yield ZERO
    # chunks, not a phantom md5('')-chunk from F.split('', ' ') == [''].
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, payload binary",
    )
    got = sorted(
        (r["media_id"], r["chunk_idx"], r["start_byte"], r["n_bytes"], r["chunk_md5"])
        for r in cdc_chunks(df).collect()
    )
    want = sorted(
        (i, *c) for i, p in enumerate(payloads) for c in _cdc_model(p)
    )
    assert got == want
    # partition property: chunks tile each payload exactly
    for i, p in enumerate(payloads):
        mine = [r for r in got if r[0] == i]
        assert sum(r[3] for r in mine) == len(p)
        if p:
            assert mine[0][2] == 1
        else:
            assert mine == []


def _bpe_model(word_counts: dict[str, int], rounds: int):
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(rounds):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


word = st.text(alphabet="abc", min_size=2, max_size=6)


@settings(**SETTINGS)
@given(st.dictionaries(word, st.integers(1, 5), min_size=1, max_size=6))
def test_bpe_model_agreement_random_vocab(spark, word_counts):
    rows = [(w,) for w, c in word_counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "text string")
    rounds = 2
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merge_rounds(df, rounds=rounds).orderBy("round").collect()
    ]
    assert got == _bpe_model(word_counts, rounds)
