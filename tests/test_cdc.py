"""Content-defined chunking: operator vs a byte-level Python reference
model, the shift-resilience property CDC exists for, and guards."""

from __future__ import annotations

import hashlib

import pytest

from sports_data_integration_and_forecasting_pipeline_spark.operators.multimodal import (
    CDC_MASK_BITS,
    CDC_WINDOW,
    cdc_chunks,
    cdc_dedup_stats,
)


def _ref(pl: bytes, w: int = CDC_WINDOW, m: int = CDC_MASK_BITS):
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


def _df(spark, payloads: dict[int, bytes]):
    return spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id long, payload binary",
    )


def test_cdc_matches_reference(spark):
    payloads = {
        1: b"GIF8" + b"the quick brown fox jumps over the lazy dog " * 8,
        2: b"xy",                        # shorter than the window
        3: b"RIFF" + bytes(range(256)),  # all byte values exercised
    }
    got = sorted(
        (r["media_id"], r["chunk_idx"], r["start_byte"], r["n_bytes"], r["chunk_md5"])
        for r in cdc_chunks(_df(spark, payloads)).collect()
    )
    want = sorted((k, *c) for k, pl in payloads.items() for c in _ref(pl))
    assert got == want


def test_cdc_shift_resilience(spark):
    """THE property fixed-size chunking lacks: prepending one byte
    shifts every fixed chunk, but CDC boundaries re-synchronize — the
    two payloads share most chunk hashes."""
    base = b"some repetitive content block " * 30
    shifted = b"Z" + base
    out = cdc_chunks(_df(spark, {1: base, 2: shifted})).collect()
    h1 = {r["chunk_md5"] for r in out if r["media_id"] == 1}
    h2 = {r["chunk_md5"] for r in out if r["media_id"] == 2}
    assert len(h1) >= 3  # enough chunks for the property to be meaningful
    shared = len(h1 & h2) / len(h1)
    assert shared >= 0.5, (len(h1), len(h2), shared)


def test_cdc_dedup_stats_accounting(spark):
    # two identical payloads + one unique: every chunk of payload 1 is
    # duplicated, so bytes_saved == payload 1's byte count
    pl = b"GIF8" + b"duplicate me please, every single byte " * 10
    out = cdc_dedup_stats(
        cdc_chunks(_df(spark, {1: pl, 2: pl, 3: b"totally different"}))
    ).collect()[0]
    assert out["total_bytes"] == 2 * len(pl) + len(b"totally different")
    assert out["bytes_saved"] == len(pl)
    assert out["n_chunks"] > out["n_distinct_chunks"]
    assert out["total_bytes"] - out["deduped_bytes"] == out["bytes_saved"]


def test_cdc_guards(spark):
    df = _df(spark, {1: b"abc"})
    with pytest.raises(ValueError, match="window must be >= 1"):
        cdc_chunks(df, window=0)
    with pytest.raises(ValueError, match="mask_bits must be >= 1"):
        cdc_chunks(df, mask_bits=0)
