"""Property-based tests (hypothesis) for the odds-math and dedup kernels —
invariants that hold for ALL inputs, beyond the reference's example-based
suite (SURVEY §5.1 notes the reference has no property tests).

Strategy: generate batches of values, evaluate the Column expressions via
one small DataFrame per test case (batched so Spark round-trips stay
cheap), and check closed-form invariants computed in plain Python.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.functions import odds_math as om

SETTINGS = dict(
    max_examples=12,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

american = st.one_of(
    st.floats(min_value=100, max_value=100000, allow_nan=False),
    st.floats(min_value=-100000, max_value=-100, allow_nan=False),
)
decimal_odds = st.floats(
    min_value=1.0001, max_value=1000, allow_nan=False, allow_infinity=False
)
prob = st.floats(min_value=0.0, max_value=1.0, allow_nan=False)


def _eval(spark, rows, expr_fn, n_cols=1):
    schema = ", ".join(f"c{i} double" for i in range(n_cols))
    df = spark.createDataFrame(rows, schema)
    cols = [F.col(f"c{i}") for i in range(n_cols)]
    return [r["out"] for r in df.select(expr_fn(*cols).alias("out")).collect()]


@given(st.lists(american, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_american_decimal_roundtrip(spark, odds):
    """Roundtrip preserves the *decimal price* (the conversion is not
    injective on the sign convention: ±100 are both even money, decimal
    2.0, and the reference maps d=2.0 to +100 — odds_utils.py:61-73)."""
    decs = _eval(spark, [(o,) for o in odds], om.american_to_decimal)
    back = _eval(spark, [(d,) for d in decs], om.decimal_to_american)
    redecs = _eval(spark, [(b,) for b in back], om.american_to_decimal)
    for o, d, b, d2 in zip(odds, decs, back, redecs):
        assert d > 1.0
        assert b is not None
        # decimal_to_american rounds to 2 dp, so the re-derived decimal
        # price may move by the rounding granularity of that branch:
        # d>=2 -> b=(d-1)*100 rounded to 2dp -> dec granularity 1e-4;
        # d<2  -> b=-100/(d-1) rounded to 2dp -> dec granularity ~ (d-1)^2/100.
        tol = 1e-4 if d >= 2 else (d - 1.0) ** 2 / 100.0 + 1e-9
        assert abs(d2 - d) <= tol


@given(st.lists(decimal_odds, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_implied_prob_in_unit_interval(spark, decs):
    ps = _eval(spark, [(d,) for d in decs], om.implied_prob)
    for d, p in zip(decs, ps):
        assert 0.0 < p < 1.0
        assert abs(p - 1.0 / d) < 1e-12


@given(st.lists(st.tuples(american, prob), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_kelly_bounded_and_capped(spark, rows):
    ks = _eval(
        spark, [(a, p) for a, p in rows], om.half_kelly_fraction, n_cols=2
    )
    for k in ks:
        assert 0.0 <= k <= om.KELLY_CAP  # cap 0.05, floor 0 (ev_calculator.py:37-45)


@given(st.lists(st.tuples(american, prob), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_ev_matches_closed_form(spark, rows):
    evs = _eval(spark, [(a, p) for a, p in rows], om.expected_value, n_cols=2)
    for (a, p), ev in zip(rows, evs):
        payout = a / 100.0 if a > 0 else 100.0 / -a
        expected = p * payout - (1.0 - p)
        assert math.isclose(ev, expected, rel_tol=1e-12, abs_tol=1e-12)


@given(
    st.lists(
        st.floats(min_value=0.01, max_value=0.99, allow_nan=False),
        min_size=2,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_devig_sums_to_one(spark, probs):
    """Proportional devig invariant (reference tests assert Σ=1 per game)."""
    df = spark.createDataFrame([(p,) for p in probs], "implied double")
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.lit(1))
    total = F.sum("implied").over(w)
    out = df.select((F.col("implied") / total).alias("devig")).collect()
    assert math.isclose(sum(r["devig"] for r in out), 1.0, rel_tol=1e-9)


@given(st.lists(st.text(alphabet="ab ", min_size=1, max_size=40), min_size=1, max_size=10))
@settings(**SETTINGS)
def test_simhash_always_16_bit(spark, texts):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import simhash16

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in simhash16(df).collect():
        assert 0 <= r["simhash16"] < 2**16


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),  # player
            st.integers(min_value=0, max_value=60),  # day offset
            st.floats(min_value=0, max_value=60, allow_nan=False),  # points
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_rolling_features_match_pandas(spark, rows):
    """Differential test vs pandas (SURVEY §7.5-4): Spark's
    rowsBetween(-4, 0) window must equal pandas rolling(5, min_periods=1),
    and lead(1) must equal shift(-1), on arbitrary seeded game logs."""
    import datetime as dt

    import pandas as pd

    from sports_data_integration_and_forecasting_pipeline_spark.operators.features import build_features

    data = [
        (p, dt.date(2026, 1, 1) + dt.timedelta(days=d), float(v), 0.0, 0.0)
        for p, d, v in rows
    ]
    # de-duplicate (player, date) keys: tie order under sort is undefined
    # in BOTH engines, so the property is only meaningful on unique keys
    seen, uniq = set(), []
    for r in data:
        if (r[0], r[1]) not in seen:
            seen.add((r[0], r[1]))
            uniq.append(r)
    sdf = spark.createDataFrame(
        uniq, "player string, date date, points double, rebounds double, assists double"
    )
    got = {
        (r["player"], r["date"]): (r["points_rolling_avg"], r["target_points"])
        for r in build_features(sdf, drop_na_target=False).collect()
    }
    pdf = pd.DataFrame(uniq, columns=["player", "date", "points", "rebounds", "assists"])
    pdf = pdf.sort_values(["player", "date"])
    pdf["roll"] = pdf.groupby("player")["points"].transform(
        lambda x: x.rolling(5, min_periods=1).mean()
    )
    pdf["tgt"] = pdf.groupby("player")["points"].shift(-1)
    for _, row in pdf.iterrows():
        g_roll, g_tgt = got[(row["player"], row["date"])]
        assert math.isclose(g_roll, row["roll"], rel_tol=1e-12, abs_tol=1e-12)
        if pd.isna(row["tgt"]):
            assert g_tgt is None
        else:
            assert g_tgt == row["tgt"]


# --- round-2 operator properties -------------------------------------------

ident = st.text(alphabet="abcdefghij", min_size=1, max_size=6)


@given(
    members=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    probes=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
)
@settings(**SETTINGS)
def test_bloom_soundness_property(spark, members, probes):
    """A bloom filter NEVER reports a true member absent, for any key set."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    keys = spark.createDataFrame([(m,) for m in members], ["key"])
    bloom = bloom_build(keys, "key", n_bits=512, k=3)
    pdf = spark.createDataFrame([(p,) for p in probes], ["key"])
    out = {r["key"]: r["bloom_pass"] for r in bloom_might_contain(pdf, "key", bloom, n_bits=512, k=3).collect()}
    for p in probes:
        if p in set(members):
            assert out[p], f"member {p} rejected"


@given(
    items=st.lists(st.integers(0, 50), min_size=1, max_size=120),
)
@settings(**SETTINGS)
def test_countmin_upper_bound_property(spark, items):
    """CMS estimates dominate true counts on arbitrary streams."""
    from collections import Counter

    from sports_data_integration_and_forecasting_pipeline_spark.operators.frequency import (
        countmin_estimate,
        countmin_sketch,
    )

    df = spark.createDataFrame([(str(i),) for i in items], ["item"])
    sk = countmin_sketch(df, "item", depth=3, width=16)
    est = {
        r["item"]: r["est_cnt"]
        for r in countmin_estimate(sk, df.distinct(), "item", depth=3, width=16).collect()
    }
    true = Counter(str(i) for i in items)
    assert set(est) == set(true)
    for k, n in true.items():
        assert est[k] >= n


@given(
    n_tokens=st.integers(1, 150),
    max_tokens=st.integers(1, 40),
    stride_frac=st.floats(0.25, 1.0),
)
@settings(**SETTINGS)
def test_chunking_tiles_every_token(spark, n_tokens, max_tokens, stride_frac):
    """Chunk layout covers the document: the final chunk ends at the last
    token, starts step by exactly `stride`, and no chunk exceeds
    `max_tokens` (for any doc length / window / overlap combination)."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.chunking import chunk_documents

    stride = max(1, int(max_tokens * stride_frac))
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, max_tokens=max_tokens, stride=stride).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert rows[0]["chunk_start"] == 0
    for a, b in zip(rows, rows[1:]):
        assert b["chunk_start"] - a["chunk_start"] == stride
    assert all(1 <= r["chunk_tokens"] <= max_tokens for r in rows)
    last = rows[-1]
    assert last["chunk_start"] + last["chunk_tokens"] == n_tokens


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=2, max_value=4),
)
@settings(**SETTINGS)
def test_substring_spans_match_reference_model(spark, docs, k):
    """r8 ExactSubstr property: over tiny random corpora from a 3-word
    vocabulary (dense with repeats), the distributed span merge equals a
    brute-force Python model — duplicated k-window starts computed by
    dictionary counting, islands merged with the q − p ≤ k rule."""
    from collections import Counter, defaultdict

    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        duplicate_substring_spans,
        release_caches,
    )

    texts = [" ".join(toks) for toks in docs]
    # reference model over the SAME tokenization (split on single space:
    # an empty token list renders as "" -> one empty token)
    tok_lists = [t.split(" ") for t in texts]
    counts = Counter(
        tuple(tl[i : i + k])
        for tl in tok_lists
        for i in range(len(tl) - k + 1)
    )
    expected = set()
    per_doc = defaultdict(list)
    for d, tl in enumerate(tok_lists):
        for i in range(len(tl) - k + 1):
            if counts[tuple(tl[i : i + k])] >= 2:
                per_doc[d].append(i + 1)  # 1-based
    for d, starts in per_doc.items():
        run = [starts[0]]
        for p in starts[1:]:
            if p - run[-1] > k:
                expected.add((d, run[0], run[-1] + k - 1, len(run)))
                run = [p]
            else:
                run.append(p)
        expected.add((d, run[0], run[-1] + k - 1, len(run)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_windows"])
        for r in duplicate_substring_spans(df, k=k).collect()
    }
    release_caches()
    assert got == expected
