"""BPE merge induction vs a reference sequential-greedy Python BPE —
including the overlapping-run cases where a naive pair merge diverges."""

from __future__ import annotations

import pytest

from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import bpe_merge_rounds


def _ref_bpe(word_counts: dict[str, int], rounds: int):
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


def _run(spark, word_counts, rounds):
    rows = [(f"d{i}",) for i in range(0)]  # placeholder
    # build a corpus whose word-frequency table equals word_counts
    text_rows = []
    for w, c in word_counts.items():
        text_rows.extend([(w,)] * c)
    df = spark.createDataFrame(text_rows, "text string")
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merge_rounds(df, rounds=rounds)
        .orderBy("round")
        .collect()
    ]
    return got


def test_bpe_matches_reference_with_overlaps(spark):
    words = {"aaaa": 5, "aaa": 3, "banana": 2, "abab": 7, "x": 1}
    assert _run(spark, words, 3) == _ref_bpe(words, 3)


def test_bpe_overlapping_run_parity(spark):
    # 6 identical symbols: greedy (a,a) yields 3 merges per word, and
    # round 2 must merge (aa, aa) — the run-parity stress case
    words = {"aaaaaa": 2, "aa": 1}
    got = _run(spark, words, 2)
    want = _ref_bpe(words, 2)
    assert got == want
    assert got[0][:2] == ("a", "a")
    assert got[1][:2] == ("aa", "aa")


def test_bpe_tie_breaks_lexicographic(spark):
    # (a,b) and (b,a) tie at count 2 -> lexicographically smaller wins
    words = {"ab": 2, "ba": 2}
    got = _run(spark, words, 1)
    assert got == [("a", "b", 2)]


def test_bpe_rounds_guard(spark):
    df = spark.createDataFrame([("x y",)], "text string")
    with pytest.raises(ValueError, match="rounds must be >= 1"):
        bpe_merge_rounds(df, rounds=0)


def test_bpe_pair_exhaustion_is_graceful(spark):
    """A vocabulary that fully merges before `rounds` rounds yields only
    the learned merges (the model's break) — no empty/null rows."""
    df = spark.createDataFrame([("aa",), ("aa",)], "text string")
    out = bpe_merge_rounds(df, rounds=3).collect()
    assert [(r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in out] == [(1, "a", "a", 2)]
