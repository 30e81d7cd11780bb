"""Round-8 operator families: exact substring dedup (ExactSubstr spans)
and the KMV/theta contamination audit."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.contamination import (
    kmv_merge,
    kmv_pairwise_overlap,
    kmv_registers,
)
from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
    duplicate_substring_spans,
)


# --- exact substring dedup -------------------------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_substring_spans_basic_cross_doc(spark):
    """A k-token passage shared by two docs is reported in BOTH, with the
    window positions merged to one maximal span each."""
    shared = " ".join(f"s{i}" for i in range(6))  # 6 shared tokens
    a = "a0 a1 " + shared + " a2 a3"
    b = "b0 " + shared + " b1 b2 b3"
    out = duplicate_substring_spans(_docs(spark, [a, b]), k=4)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0, 1}
    # doc 0: shared tokens occupy positions 3-8; duplicated 4-windows
    # start at 3,4,5 -> one span [3, 8] with 3 windows
    assert (rows[0]["span_start"], rows[0]["span_end"]) == (3, 8)
    assert rows[0]["span_tokens"] == 6 and rows[0]["n_dup_windows"] == 3
    # doc 1: shared at positions 2-7
    assert (rows[1]["span_start"], rows[1]["span_end"]) == (2, 7)


def test_substring_spans_self_repeat_counts(spark):
    """Verbatim is verbatim: a passage repeated INSIDE one doc is
    duplicated even though it appears in only one document."""
    rep = " ".join(f"r{i}" for i in range(4))
    doc = rep + " x0 x1 " + rep
    out = duplicate_substring_spans(_docs(spark, [doc]), k=4).collect()
    spans = sorted((r["span_start"], r["span_end"]) for r in out)
    assert spans == [(1, 4), (7, 10)]


def test_substring_spans_island_gap_rule(spark):
    """Windows p and q merge iff q - p <= k (abutting spans coalesce);
    a one-token unique gap splits islands."""
    blk = lambda tag: " ".join(f"{tag}{i}" for i in range(3))
    # doc 0 and doc 1 share two 3-token blocks separated by a unique token
    d0 = blk("u") + " g0 " + blk("v")
    d1 = blk("u") + " g1 " + blk("v")
    out = duplicate_substring_spans(_docs(spark, [d0, d1]), k=3)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    # two separate islands per doc: [1,3] and [5,7]
    assert sorted(per_doc[0]) == [(1, 3), (5, 7)]
    assert sorted(per_doc[1]) == [(1, 3), (5, 7)]


def test_substring_spans_no_dups_empty_and_short_docs(spark):
    """Unique corpus -> empty output; docs shorter than k yield no
    windows (and never a descending-sequence artifact)."""
    out = duplicate_substring_spans(
        _docs(spark, ["a b c d e", "f g h i j", "k l"]), k=4
    )
    assert out.count() == 0


def test_substring_spans_guards(spark):
    df = _docs(spark, ["a b c"])
    with pytest.raises(ValueError, match="k must be >= 2"):
        duplicate_substring_spans(df, k=1)
    with pytest.raises(ValueError, match="min_count must be >= 2"):
        duplicate_substring_spans(df, k=3, min_count=1)


# --- KMV contamination audit -----------------------------------------------


def _kmv_true_jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


def test_kmv_exact_regime_small_union(spark):
    """|A ∪ B| <= k degenerates to the full sets: the estimate IS the
    true Jaccard (floor'd to micro-units)."""
    a = {f"v{i}" for i in range(30)}
    b = {f"v{i}" for i in range(20, 50)}  # |A∩B|=10, |A∪B|=50, J=0.2
    df = spark.createDataFrame(
        [("A", v) for v in a] + [("B", v) for v in b], "g string, v string"
    )
    regs = kmv_registers(df, "g", "v", k=128)
    out = kmv_pairwise_overlap(regs, "g", k=128).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("A", "B")
    assert r["n_union"] == 50 and r["n_overlap"] == 10
    assert r["jaccard_e6"] == 200_000


def test_kmv_error_bound_large_union(spark):
    """Sketch regime: with k=256 over a J=1/3 pair the estimate lands
    within the O(1/sqrt(k)) band (3 sigma ~ 0.09 absolute here; assert
    a loose 0.12 so the test is deterministic-hash-specific but not
    brittle to the exact md5 draw)."""
    n = 3_000
    a = {f"x{i}" for i in range(2 * n)}            # 6000
    b = {f"x{i}" for i in range(n, 3 * n)}         # 6000, inter 3000, union 9000
    true_j = _kmv_true_jaccard(a, b)
    df = spark.createDataFrame(
        [("A", v) for v in a] + [("B", v) for v in b], "g string, v string"
    )
    k = 256
    regs = kmv_registers(df, "g", "v", k=k)
    r = kmv_pairwise_overlap(regs, "g", k=k).collect()[0]
    assert r["n_union"] == k
    est = r["jaccard_e6"] / 1e6
    assert abs(est - true_j) < 0.12, (est, true_j)


def test_kmv_registers_match_reference_model(spark):
    """The sketch is EXACTLY the k lexicographically-smallest distinct
    md5 hex digests — verified against a pure-Python model."""
    vals = [f"t{i}" for i in range(500)]
    df = spark.createDataFrame([("G", v) for v in vals], "g string, v string")
    got = [
        r["h"]
        for r in kmv_registers(df, "g", "v", k=32)
        .orderBy("register_idx")
        .collect()
    ]
    want = sorted(hashlib.md5(v.encode()).hexdigest() for v in set(vals))[:32]
    assert got == want


def test_kmv_merge_is_union_sketch(spark):
    """Monoid law: k-smallest of the union of two groups' registers ==
    the sketch built directly from the unioned underlying set."""
    a = [f"m{i}" for i in range(400)]
    b = [f"m{i}" for i in range(200, 600)]
    k = 64
    parts = spark.createDataFrame(
        [("day1", v) for v in a] + [("day2", v) for v in b],
        "g string, v string",
    )
    regs = kmv_registers(parts, "g", "v", k=k).withColumn("g", F.lit("all"))
    merged = {
        r["h"] for r in kmv_merge(regs, "g", k=k).collect()
    }
    direct = spark.createDataFrame(
        [("all", v) for v in set(a) | set(b)], "g string, v string"
    )
    want = {r["h"] for r in kmv_registers(direct, "g", "v", k=k).collect()}
    assert merged == want


def test_kmv_registers_guard(spark):
    df = spark.createDataFrame([("G", "v")], "g string, v string")
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_registers(df, "g", "v", k=1)


def test_kmv_build_k_stamp_and_query_k_guard(spark):
    """r9 (r8 review finding): the sketch carries its build k, and a
    query k above it fails loudly — union ranks beyond build k are not
    guaranteed to be the true union's k-smallest."""
    vals = [f"g{i}" for i in range(300)]
    df = spark.createDataFrame(
        [("A", v) for v in vals[:200]] + [("B", v) for v in vals[100:]],
        "g string, v string",
    )
    regs = kmv_registers(df, "g", "v", k=32)
    assert {r["build_k"] for r in regs.select("build_k").distinct().collect()} == {32}
    with pytest.raises(ValueError, match="exceeds the sketches' build k"):
        kmv_pairwise_overlap(regs, "g", k=64)
    # at or below build k the audit runs
    assert kmv_pairwise_overlap(regs, "g", k=32).count() == 1


def test_kmv_merge_truncates_to_weakest_build_k(spark):
    """Merging sketches of unequal build k yields a sketch valid (and
    truncated, and stamped) at the weakest contributor's k."""
    vals = [f"w{i}" for i in range(500)]
    df = spark.createDataFrame([("G", v) for v in vals], "g string, v string")
    small = kmv_registers(df, "g", "v", k=16)
    big = kmv_registers(df, "g", "v", k=64)
    merged = kmv_merge(small.unionByName(big), "g", k=64)
    rows = merged.collect()
    assert max(r["register_idx"] for r in rows) == 16
    assert {r["build_k"] for r in rows} == {16}
    # and the kept registers are exactly the 16-smallest (monoid law
    # still holds at the truncated k)
    want = {r["h"] for r in small.collect()}
    assert {r["h"] for r in rows} == want


def test_shingle_rows_matches_transform_form(spark):
    """The codegen lead-window enumerator yields the SAME multiset of
    shingles as exploding shingles_from_tokens — including the short-doc
    clamp (len < n -> exactly one short shingle)."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        shingle_rows,
        shingles_from_tokens,
    )

    texts = [
        "a b c d e f",
        "x y z",
        "p q",       # 2 tokens < n: one clamped shingle "p q"
        "solo",      # 1 token: one shingle "solo"
        "r r r r",   # repeats: duplicates preserved
    ]
    df = _docs(spark, texts)
    got = sorted(
        (r["doc_id"], r["shingle"])
        for r in shingle_rows(df, n=3).collect()
    )
    want = sorted(
        (r["doc_id"], r["g"])
        for r in df.select(
            "doc_id",
            F.explode(
                shingles_from_tokens(F.split(F.col("text"), " "), 3)
            ).alias("g"),
        ).collect()
    )
    assert got == want


def test_clip_substring_spans_rebuilds_survivors(spark):
    """Clipping removes exactly the covered tokens and rebuilds the text
    in order; unclipped docs pass through token-normalized."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        clip_substring_spans,
    )

    shared = " ".join(f"s{i}" for i in range(4))
    a = "a0 a1 " + shared + " a2"
    b = "b0 " + shared + " b1"
    c = "u0 u1 u2 u3 u4"
    out = {
        r["doc_id"]: r
        for r in clip_substring_spans(_docs(spark, [a, b, c]), k=4).collect()
    }
    assert out[0]["clean_text"] == "a0 a1 a2"
    assert out[0]["n_tokens"] == 3 and out[0]["n_removed_tokens"] == 4
    assert out[1]["clean_text"] == "b0 b1"
    assert out[2]["clean_text"] == c and out[2]["n_removed_tokens"] == 0
    assert len(out) == 3


def test_clip_substring_spans_fully_duplicated_doc(spark):
    """A doc that is one big duplicated span clips to the empty string —
    row preserved (corpus replacement, not a patch)."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        clip_substring_spans,
    )

    t = "d0 d1 d2 d3"
    out = {
        r["doc_id"]: r
        for r in clip_substring_spans(_docs(spark, [t, t]), k=4).collect()
    }
    assert out[0]["clean_text"] == "" and out[0]["n_tokens"] == 0
    assert out[0]["n_removed_tokens"] == 4
    assert out[1]["clean_text"] == ""


def test_ann_recall_audit_invariants(spark):
    """recall@k is a sane fraction: 0 <= n_hit <= min(n_exact, n_ann),
    n_exact == k when the corpus has >= k candidates, and recall_e6 is
    the exact integer micro-fraction."""
    from sports_data_integration_and_forecasting_pipeline_spark.plans import QUERIES

    rows = (
        QUERIES["embed_ann_recall_audit"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 10
    for r in rows:
        assert r["n_exact"] == 5
        assert 0 <= r["n_hit"] <= min(r["n_exact"], r["n_ann"])
        assert r["recall_e6"] == r["n_hit"] * 1_000_000 // r["n_exact"]


def test_incremental_substring_equals_full_recompute(spark):
    """The incremental path (batch grams + corpus state) returns exactly
    the full-union recompute's spans restricted to the batch docs —
    including a batch-only self-repeat the state knows nothing about."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        duplicate_substring_spans,
        incremental_duplicate_spans,
        substring_gram_counts,
    )

    shared = " ".join(f"s{i}" for i in range(4))
    rep = " ".join(f"r{i}" for i in range(4))
    old_docs = _docs(spark, ["o0 " + shared + " o1", "unrelated old words here"])
    new_texts = [
        "n0 " + shared + " n1",        # duplicated vs STATE only
        rep + " gap0 gap1 " + rep,     # duplicated IN-BATCH-doc only
        "totally novel content block",
    ]
    new_docs = spark.createDataFrame(
        [(10 + i, t) for i, t in enumerate(new_texts)],
        "doc_id long, text string",
    )
    state = substring_gram_counts(old_docs, k=4)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_windows"])
        for r in incremental_duplicate_spans(new_docs, state, k=4).collect()
    }
    full = duplicate_substring_spans(
        old_docs.unionByName(new_docs), k=4
    ).filter(F.col("doc_id") >= 10)
    want = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_windows"])
        for r in full.collect()
    }
    assert got == want and got  # non-empty: both cases present
    assert any(d == 10 for d, *_ in got) and any(d == 11 for d, *_ in got)


def test_shingle_rows_unique_id_false_no_cross_row_stitching(spark):
    """r9 (r8 review finding): rows sharing an id interleave under the
    per-id lead window and stitch n-grams across texts. With
    unique_id=False each physical row shingles independently — the
    multiset equals shingling the rows under distinct ids."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import shingle_rows

    rows = [("d", "a b c d"), ("d", "x y z w"), ("e", "p q r s")]
    dup = spark.createDataFrame(rows, "doc_id string, text string")
    got = sorted(
        (r["doc_id"], r["shingle"])
        for r in shingle_rows(dup, n=3, unique_id=False).collect()
    )
    uniq = spark.createDataFrame(
        [(f"r{i}", d, t) for i, (d, t) in enumerate(rows)],
        "rid string, doc_id string, text string",
    )
    want = sorted(
        (r["doc_id"], r["shingle"])
        for r in shingle_rows(
            uniq, id_col="rid", keep_cols=("doc_id",), n=3
        ).select("doc_id", "shingle").collect()
    )
    assert got == want
    # and the stitched gram "c d x" must NOT appear
    assert all("c d x" != s for _, s in got)


def test_jaccard_pairs_unique_id_false_unions_row_shingles(spark):
    """Public-operator contract: with unique_id=False, duplicate-id rows
    score as ONE document whose shingle set is the union of its rows'."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import shingle_jaccard_pairs

    # doc A split over two rows; doc B equals row 1 of A exactly
    dup = spark.createDataFrame(
        [("A", "a b c d e"), ("A", "f g h i j"), ("B", "a b c d e")],
        "doc_id string, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in shingle_jaccard_pairs(dup, n=3, unique_id=False).collect()
    }
    # A has 6 shingles (3 per row), B has 3, intersection 3 -> J = 3/6
    assert out == {("A", "B"): 0.5}
