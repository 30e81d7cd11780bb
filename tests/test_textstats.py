"""Unit tests for text-analysis operators (SURVEY §7.3-7 north-star scope)
on tiny hand-computed inputs."""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
    doc_fingerprint,
    language_id,
    text_quality,
    token_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


def test_token_stats_counts(spark):
    df = _docs(spark, [(1, "a b c d", 7), (2, "hello", 5)])
    got = {r["doc_id"]: r for r in token_stats(df).collect()}
    assert got[1]["n_ws_tokens"] == 4
    assert got[1]["est_bpe_tokens"] == 2  # ceil(7/4)
    assert got[1]["chars_per_token"] == 7 / 4
    assert got[2]["n_ws_tokens"] == 1
    assert got[2]["est_bpe_tokens"] == 2


def test_text_quality_signals(spark):
    # 4 tokens, 1 stopword ("the"), 1 punct char, 16 chars.
    df = _docs(spark, [(1, "the cat sat down.", 17)])
    r = text_quality(df).collect()[0]
    assert r["n_tokens"] == 4
    assert r["stopword_ratio"] == 0.25
    assert r["punct_ratio"] == 1 / 17
    # avg word len: (17 - 3 spaces) / 4
    assert r["avg_word_len"] == 14 / 4
    assert r["quality_score"] == 0.25 * 0.5 + 4 / 100.0 * 0.5


def test_language_id_argmax_and_tie_priority(spark):
    df = _docs(
        spark,
        [
            (1, "the cat and the dog is here", 0),
            (2, "der hund und die katze ist", 0),
            (3, "le chat est une idee les", 0),
            # tie: "de" appears in both de-markers? no — "de" is zh marker;
            # "le" is fr AND zh marker -> one count each -> priority en>..>fr
            # picks fr over zh.
            (4, "le", 0),
        ],
    )
    got = {r["doc_id"]: r["predicted_lang"] for r in language_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "fr"


def test_doc_fingerprint_case_insensitive(spark):
    df = _docs(spark, [(1, "Hello World", 11), (2, "hello world", 11)])
    fps = [r["md5_fp"] for r in doc_fingerprint(df).collect()]
    assert fps[0] == fps[1]
    assert len(fps[0]) == 32


def test_benchmark_contamination_semantics(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.decontam import (
        benchmark_contamination,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # contains bench
            (2, "entirely disjoint vocabulary with zero overlap here"),
            (3, "quick brown fox jumps high"),  # partial overlap
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in benchmark_contamination(corpus, bench, min_hits=2).collect()
    }
    # bench has 3 distinct 3-grams; doc 1 contains all 3 of them
    assert out[1]["n_hit"] == 3 and out[1]["contaminated"]
    assert out[2]["n_hit"] == 0 and not out[2]["contaminated"]
    # doc 3 shares "quick brown fox" and "brown fox jumps" only
    assert out[3]["n_hit"] == 2 and out[3]["contaminated"]
    assert out[3]["contamination"] == 2 / 3  # 3 shingles in doc 3


def test_repetition_stats_semantics(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a a a a"),                    # fully repetitive
            (2, "w x y z q r"),                # all grams unique
            (3, "a b a b a b c"),              # 'a b' dominates
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["top_2gram_frac"] == 1.0 and out[1]["dup_3gram_frac"] == 1.0
    assert out[2]["top_2gram_frac"] == 1 / 5 and out[2]["dup_3gram_frac"] == 0.0
    # doc 3: 6 2-grams, 'a b' x3 -> 0.5; 5 3-grams, 'a b a' x2 + 'b a b' x2 -> 4/5
    assert out[3]["n_2grams"] == 6 and out[3]["top_2gram_frac"] == 0.5
    assert out[3]["n_3grams"] == 5 and out[3]["dup_3gram_frac"] == 4 / 5


def test_inverted_index_caps_postings_but_counts_full_df(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import inverted_index

    docs = spark.createDataFrame(
        [(i, "common unique%d" % i) for i in range(10)], ["doc_id", "text"]
    )
    out = {r["term"]: r for r in inverted_index(docs, max_postings=4).collect()}
    hot = out["common"]
    assert hot["df"] == 10  # df counts every doc...
    assert hot["postings_csv"] == "0,1,2,3"  # ...postings cap at 4, lowest ids
    assert out["unique3"]["df"] == 1 and out["unique3"]["postings_csv"] == "3"


def test_source_reputation_rollup(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        source_reputation,
    )

    rows = [
        (1, "the cat sat", "A"),
        (2, "the cat sat", "B"),   # exact copy, higher id -> B eats the dup
        (3, "pure novel words", "B"),
        (4, "of the and to in", "A"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in source_reputation(df).collect()}
    assert got["A"]["n_docs"] == 2 and got["A"]["n_dup_docs"] == 0
    assert got["B"]["n_docs"] == 2 and got["B"]["n_dup_docs"] == 1
    assert got["B"]["dup_rate"] == 0.5
    # A: tokens 3 + 5, stopwords 1 ("the") + 5 (all) = 6/8
    assert got["A"]["total_tokens"] == 8
    assert abs(got["A"]["stopword_ratio"] - 6 / 8) < 1e-12


def test_quality_linear_filter_integer_exact(spark):
    """The logit is exact integer arithmetic over pinned literals —
    verified against a pure-Python model on synthetic docs."""
    import math

    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        EN_STOPWORDS,
        QUALITY_W0_E6,
        QUALITY_W_AWL_E3,
        QUALITY_W_LEN_E3,
        QUALITY_W_PUNCT_E3,
        QUALITY_W_STOP_E3,
        quality_linear_filter,
    )

    texts = [
        "the quick brown fox is on the mat and it is fine",
        "aaaa;;;; bbbb!!!! cccc????",
        "x",
        "the " * 150 + "end",
    ]
    rows = [(i, t.strip(), len(t.strip())) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    got = {r["doc_id"]: (r["logit_e6"], r["kept"])
           for r in quality_linear_filter(df).collect()}

    def tdiv(a, b):  # truncating integer division (Spark DIV / DuckDB //)
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    for i, t, nc in rows:
        toks = t.split(" ")
        n = len(toks)
        stop = sum(1 for x in toks if x in EN_STOPWORDS)
        punct = sum(1 for c in t if c in ".,;:!?")
        e6 = lambda num, den: math.floor(num / den * 1e6 + 0.5)
        f = (e6(stop, n), e6(punct, nc), min(n, 100) * 10_000,
             e6(nc - (n - 1), n))
        logit = (QUALITY_W0_E6
                 + tdiv(QUALITY_W_STOP_E3 * f[0], 1000)
                 + tdiv(QUALITY_W_PUNCT_E3 * f[1], 1000)
                 + tdiv(QUALITY_W_LEN_E3 * f[2], 1000)
                 + tdiv(QUALITY_W_AWL_E3 * f[3], 1000))
        assert got[i] == (logit, logit >= 0), (i, got[i], logit)
    # the battery weights actually separate: natural text kept, junk cut
    assert got[0][1] is True and got[1][1] is False


def test_quality_linear_filter_degenerate_rows(spark):
    """n_chars = 0 (or NULL) must produce a CONCRETE kept decision, not
    a NULL logit from x/0 — Spark NULLs the division while DuckDB float
    semantics may differ, so an unguarded divide silently diverges from
    the oracle (ADVICE r9). Guarded features are 0 on the degenerate
    denominator."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        quality_linear_filter,
    )

    df = spark.createDataFrame(
        [(0, "", 0), (1, "ok text here", None), (2, "fine", 4)],
        "doc_id long, text string, n_chars long",
    )
    got = {r["doc_id"]: r for r in quality_linear_filter(df).collect()}
    for i in (0, 1):
        assert got[i]["punct_e6"] == 0
        assert got[i]["logit_e6"] is not None
        assert got[i]["kept"] is not None
    assert got[0]["kept"] is False  # empty doc: only bias + tiny terms
    assert got[2]["kept"] is not None


def test_distinct_ngram_stats_hand_corpus(spark):
    """Exact counts on a hand corpus: repeated tokens/bigrams collapse
    in the distinct count, empty tokens are dropped, and the ratio is
    exact integer micro-units (truncating div)."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        distinct_ngram_stats,
    )

    rows = [
        (0, "en", "a b a b"),     # unigrams a,b,a,b; bigrams ab,ba,ab
        (1, "en", "a  c"),        # double space -> empty token dropped
        (2, "de", "x x x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["lang"], r["n"]): (
            r["total_ngrams"], r["distinct_ngrams"], r["distinct_ratio_e6"]
        )
        for r in distinct_ngram_stats(df, group_col="lang").collect()
    }
    # en unigrams: a b a b a c -> 6 total, 3 distinct
    assert got[("en", 1)] == (6, 3, 500_000)
    # en bigrams: (a b)(b a)(a b) from doc0 + (a c) from doc1 -> 4 total,
    # 3 distinct -> 750000
    assert got[("en", 2)] == (4, 3, 750_000)
    # de: 3 unigrams 1 distinct -> 333333 (truncating div)
    assert got[("de", 1)] == (3, 1, 333_333)
    assert got[("de", 2)] == (2, 1, 500_000)


def test_bpe_fertility_stats_model(spark):
    """Per-group fertility off the learned segmentation vs a pure-Python
    learn+encode model (reuses the ratios' exact integer contract)."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        bpe_fertility_stats,
    )

    rows = [
        (0, "en", "aa aa bb"),
        (1, "en", "aa cc"),
        (2, "de", "dd dd dd dd"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["lang"]: r for r in bpe_fertility_stats(df, rounds=1).collect()}
    # rounds=1 learns the most frequent pair: ('d','d') wc 4 vs ('a','a')
    # wc 3 -> merge (d,d). Segmentations: aa->[a,a], bb->[b,b], cc->[c,c],
    # dd->[dd].
    # en: words aa,aa,bb,aa,cc -> 5 words, 10 tokens, all single-char
    assert (got["en"]["n_words"], got["en"]["n_bpe_tokens"],
            got["en"]["n_char_tokens"]) == (5, 10, 10)
    assert got["en"]["fertility_e6"] == 2_000_000
    assert got["en"]["fallback_e6"] == 1_000_000
    # de: 4 words 'dd' -> 4 tokens 'dd', zero single-char fallback
    assert (got["de"]["n_words"], got["de"]["n_bpe_tokens"],
            got["de"]["n_char_tokens"]) == (4, 4, 0)
    assert got["de"]["fertility_e6"] == 1_000_000
    assert got["de"]["fallback_e6"] == 0
