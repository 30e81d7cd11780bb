"""Round-12 property tests — model parity + degenerate-input coverage
for the new operators (the r12 arrival convention: any entry that
divides by a class/group count ships WITH its one-sided/empty case):

- ``waterfill_token_caps`` must equal an iterative greedy waterfilling
  reference on random supplies/budgets, and must DEGRADE (never divide
  by zero) when budget >= total, budget = 0, or a domain has 0 tokens.
- ``ngram_novelty_stats`` must equal a pure-Python train/heldout
  n-gram overlap reference (same md5 split, same h60 gram identity),
  and must degrade when the train split is EMPTY (novelty = 1e6, not a
  crash) or the heldout split is empty (0 rows).
- ``substring_duplication_coverage`` must equal an interval-union
  reference, and a corpus with NO duplicated k-grams yields coverage 0
  everywhere (never an error).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
    substring_duplication_coverage,
)
from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import (
    waterfill_token_caps,
)
from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
    ngram_novelty_stats,
)

SETTINGS = dict(
    max_examples=8,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --- waterfilling vs greedy reference ---------------------------------------


def _waterfill_ref(supplies: dict[str, int], budget: int):
    """Iterative reference: walk domains in ascending-supply order with
    the FULL prefix sum in the feasibility test (the symmetric water
    level — equal supplies always get equal allocations; an
    uncapped-only accumulator would let the second of two identical
    domains sneak under the level the first one failed)."""
    m = len(supplies)
    order = sorted(supplies.items(), key=lambda kv: (kv[1], kv[0]))
    uncapped, s_prev = set(), 0
    for r, (name, n) in enumerate(order, start=1):
        if n * (m - r + 1) <= budget - s_prev:
            uncapped.add(name)
        s_prev += n
    j = len(uncapped)
    s_j = sum(n for name, n in order[:j])
    tau = None if j == m else (budget - s_j) // (m - j)
    return {
        name: (n if name in uncapped else tau, name not in uncapped, tau)
        for name, n in supplies.items()
    }


domains = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d", "e", "f"]),
    st.integers(0, 50),
    min_size=1,
    max_size=6,
)


@given(supplies=domains, num=st.integers(0, 3), den=st.integers(1, 3))
@settings(**SETTINGS)
def test_waterfill_matches_greedy_reference(spark, supplies, num, den):
    rows = [
        (dom, " ".join(f"w{i}" for i in range(n)) if n else "")
        for dom, n in supplies.items()
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    # size(split('', ' ')) == 1: an empty text still counts one token,
    # so feed the reference the SAME per-domain supply the operator sees
    seen = {dom: max(n, 1) for dom, n in supplies.items()}
    total = sum(seen.values())
    budget = total * num // den
    expect = _waterfill_ref(seen, budget)
    got = {
        r["lang"]: r
        for r in waterfill_token_caps(
            df, "lang", budget_num=num, budget_den=den
        ).collect()
    }
    assert set(got) == set(expect)
    spent = 0
    for dom, (alloc, capped, tau) in expect.items():
        r = got[dom]
        assert r["n_tokens"] == seen[dom]
        assert r["alloc_tokens"] == alloc, (dom, dict(r.asDict()), expect)
        assert r["is_capped"] == capped
        assert r["water_level"] == tau
        spent += r["alloc_tokens"]
    # the waterfilling contract: budget respected, slack < m (unless
    # nobody is capped, where spend = total supply <= budget)
    if any(c for _, c, _ in expect.values()):
        # integer-floor slack: B - spend = (B - S_j) mod (m - j) < m
        assert spent <= budget
        assert budget - spent < len(seen)
    else:
        assert spent == total <= budget


def test_waterfill_degenerate_cases(spark):
    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z w v"), ("c", "x")],
        "lang string, text string",
    )
    # budget >= total: nobody capped, level NULL, everyone whole
    full = {r["lang"]: r for r in waterfill_token_caps(df, "lang", budget_num=1, budget_den=1).collect()}
    assert all(not r["is_capped"] for r in full.values())
    assert all(r["water_level"] is None for r in full.values())
    assert all(r["alloc_tokens"] == r["n_tokens"] for r in full.values())
    # budget 0: every positive domain capped at level 0
    zero = {r["lang"]: r for r in waterfill_token_caps(df, "lang", budget_num=0, budget_den=1).collect()}
    assert all(r["is_capped"] for r in zero.values())
    assert all(r["alloc_tokens"] == 0 for r in zero.values())
    assert all(r["water_level"] == 0 for r in zero.values())
    # single domain, half budget: capped exactly at the budget
    one = waterfill_token_caps(
        spark.createDataFrame([("solo", "a b c d")], "lang string, text string"),
        "lang",
    ).collect()[0]
    assert one["is_capped"] and one["alloc_tokens"] == 2 == one["water_level"]


# --- n-gram novelty vs pure-Python reference --------------------------------


def _novelty_ref(rows, frac, salt, max_n):
    held = {}
    train = set()
    for doc_id, lang, text in rows:
        ho = _h60(f"{salt}{doc_id}") / float(1 << 60) < frac
        toks = [t for t in text.split(" ") if t != ""]
        for n in range(1, max_n + 1):
            for i in range(len(toks) - n + 1):
                gh = _h60(" ".join(toks[i : i + n]))
                if ho:
                    held.setdefault((lang, n), []).append(gh)
                else:
                    train.add((n, gh))
    out = {}
    for (lang, n), ghs in held.items():
        novel = sum(1 for gh in ghs if (n, gh) not in train)
        out[(lang, n)] = (len(ghs), novel, 1_000_000 * novel // len(ghs))
    return out


corpora = st.lists(
    st.tuples(
        st.sampled_from(["en", "de"]),
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8),
    ),
    min_size=1,
    max_size=10,
)


@given(docs=corpora, frac=st.sampled_from([0.2, 0.5, 0.8]))
@settings(**SETTINGS)
def test_ngram_novelty_matches_reference(spark, docs, frac):
    rows = [(i, lang, " ".join(toks)) for i, (lang, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    expect = _novelty_ref(rows, frac, "nov", 3)
    got = {
        (r["lang"], r["n"]): (r["heldout_ngrams"], r["novel_ngrams"], r["novelty_e6"])
        for r in ngram_novelty_stats(df, holdout_fraction=frac).collect()
    }
    assert got == expect


def test_ngram_novelty_degenerate_splits(spark):
    df = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "en", "a b d")],
        "doc_id long, lang string, text string",
    )
    # train split EMPTY (holdout ~ everything): every heldout gram is
    # novel — rate pins to 1e6, no crash (the one-sided-input contract)
    allheld = ngram_novelty_stats(df, holdout_fraction=0.999999).collect()
    assert allheld and all(r["novelty_e6"] == 1_000_000 for r in allheld)
    assert all(r["novel_ngrams"] == r["heldout_ngrams"] for r in allheld)
    # heldout split EMPTY: zero rows, not an error
    nothing = ngram_novelty_stats(df, holdout_fraction=1e-12).collect()
    assert nothing == []


# --- substring coverage vs interval-union reference -------------------------


def _coverage_ref(rows, k, min_count=2):
    from collections import Counter, defaultdict

    occ = Counter()
    pos_by_doc = defaultdict(list)
    toks_by_doc = {}
    for doc_id, lang, text in rows:
        toks = text.split(" ")
        toks_by_doc[doc_id] = (lang, len(toks))
        for p in range(1, len(toks) - k + 2):
            occ[" ".join(toks[p - 1 : p + k - 1])] += 1
    for doc_id, lang, text in rows:
        toks = text.split(" ")
        for p in range(1, len(toks) - k + 2):
            if occ[" ".join(toks[p - 1 : p + k - 1])] >= min_count:
                pos_by_doc[doc_id].append(p)
    per_group = defaultdict(lambda: [0, 0, 0, 0])  # docs, dup docs, toks, cov
    for doc_id, (lang, n_tok) in toks_by_doc.items():
        covered = 0
        spans = pos_by_doc.get(doc_id, [])
        if spans:
            start = prev = spans[0]
            for p in spans[1:]:
                if p - prev > k:
                    covered += prev + k - 1 - start + 1
                    start = p
                prev = p
            covered += prev + k - 1 - start + 1
        g = per_group[lang]
        g[0] += 1
        g[1] += 1 if covered else 0
        g[2] += n_tok
        g[3] += covered
    return {
        lang: (d, dd, t, c, (1_000_000 * c // t) if t else None)
        for lang, (d, dd, t, c) in per_group.items()
    }


dup_corpora = st.lists(
    st.tuples(
        st.sampled_from(["en", "de"]),
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12),
    ),
    min_size=2,
    max_size=8,
)


@given(docs=dup_corpora, k=st.sampled_from([2, 3]))
@settings(**SETTINGS)
def test_substring_coverage_matches_reference(spark, docs, k):
    rows = [(i, lang, " ".join(toks)) for i, (lang, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    expect = _coverage_ref(rows, k)
    got = {
        r["lang"]: (
            r["n_docs"],
            r["docs_with_dups"],
            r["total_tokens"],
            r["covered_tokens"],
            r["coverage_e6"],
        )
        for r in substring_duplication_coverage(df, k=k).collect()
    }
    assert got == expect


def test_substring_coverage_no_dups_is_zero_not_error(spark):
    # every 2-gram unique: coverage must be 0 for every group
    df = spark.createDataFrame(
        [(1, "en", "a b c d"), (2, "de", "e f g h")],
        "doc_id long, lang string, text string",
    )
    out = {r["lang"]: r for r in substring_duplication_coverage(df, k=2).collect()}
    assert set(out) == {"en", "de"}
    for r in out.values():
        assert r["covered_tokens"] == 0 and r["coverage_e6"] == 0
        assert r["docs_with_dups"] == 0


# --- budget-cap prefix selection vs brute-force reference -------------------


def _prefix_fill_ref(docs, caps):
    """Brute force: per domain, sort docs by (h60('v6'||id), id), take
    the prefix whose cumulative tokens fit the cap."""
    out = {}
    for dom, alloc in caps.items():
        mine = sorted(
            ((did, n) for did, d, n in docs if d == dom),
            key=lambda t: (_h60(f"v6{t[0]}"), t[0]),
        )
        cum = 0
        n_sel = 0
        realized = 0
        for did, n in mine:
            cum += n
            if cum <= alloc:
                n_sel += 1
                realized += n
        if mine:
            out[dom] = (
                len(mine),
                alloc,
                n_sel,
                realized,
                1_000_000 * realized // alloc if alloc > 0 else None,
            )
    return out


cap_corpora = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "fr"]),
        st.integers(min_value=1, max_value=40),
    ),
    min_size=1,
    max_size=24,
)


@given(
    docs=cap_corpora,
    caps=st.fixed_dictionaries(
        {},
        optional={
            "en": st.integers(min_value=0, max_value=200),
            "de": st.integers(min_value=0, max_value=200),
            "fr": st.integers(min_value=0, max_value=200),
        },
    ),
)
@settings(**SETTINGS)
def test_budget_cap_prefix_matches_reference(spark, docs, caps):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import (
        budget_cap_prefix_select,
    )

    rows = [(i, dom, n) for i, (dom, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    caps_df = spark.createDataFrame(
        list(caps.items()) or [("zz", 0)], "lang string, alloc_tokens long"
    )
    expect = _prefix_fill_ref(rows, caps)
    got = {
        r["lang"]: (
            r["n_docs_in"],
            r["alloc_tokens"],
            r["n_docs_sel"],
            r["realized_tokens"],
            r["fill_e6"],
        )
        for r in budget_cap_prefix_select(df, caps_df).collect()
    }
    assert got == expect


def test_budget_cap_prefix_degenerate_cases(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import (
        budget_cap_prefix_select,
    )

    df = spark.createDataFrame(
        [(1, "en", 5), (2, "en", 7), (3, "de", 3)],
        "doc_id long, lang string, n_tok long",
    )
    # zero cap: 0 selected, fill NULL — never a division error
    caps = spark.createDataFrame(
        [("en", 0), ("de", 100)], "lang string, alloc_tokens long"
    )
    out = {r["lang"]: r for r in budget_cap_prefix_select(df, caps).collect()}
    assert out["en"]["n_docs_sel"] == 0
    assert out["en"]["realized_tokens"] == 0
    assert out["en"]["fill_e6"] is None
    # cap >= supply: everything selected, fill < 1e6 reflects underfill
    assert out["de"]["n_docs_sel"] == 1
    assert out["de"]["realized_tokens"] == 3
    assert out["de"]["fill_e6"] == 1_000_000 * 3 // 100
    # a domain absent from caps is dropped (inner join), not invented
    assert set(out) == {"en", "de"}
    # empty input: zero rows, no error
    empty = spark.createDataFrame([], "doc_id long, lang string, n_tok long")
    assert budget_cap_prefix_select(empty, caps).count() == 0


# --- Zipf fit vs brute-force OLS reference ----------------------------------


def _zipf_ref(docs, top_k=100):
    """Brute force: per group, term counts, rank by (count desc, term),
    integer micro-nat OLS over the top_k ranks."""
    import math
    from collections import Counter

    by_lang = {}
    for lang, text in docs:
        toks = [t for t in text.split(" ") if t != ""]
        by_lang.setdefault(lang, Counter()).update(toks)
    out = {}
    for lang, tf in by_lang.items():
        if not tf:
            continue
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        xs = [
            math.floor(math.log(r) * 1e6 + 0.5)
            for r in range(1, len(ranked) + 1)
        ]
        ys = [math.floor(math.log(c) * 1e6 + 0.5) for _, c in ranked]
        k = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        num, dx, dy = k * sxy - sx * sy, k * sxx - sx * sx, k * syy - sy * sy

        def r6(v):
            return math.floor(v * 1e6 + 0.5) / 1e6

        slope = r6(num / dx) if dx > 0 else None
        r2 = r6(num * num / (dx * dy)) if dx > 0 and dy > 0 else None
        out[lang] = (len(tf), k, slope, r2)
    return out


zipf_corpora = st.lists(
    st.tuples(
        st.sampled_from(["en", "de"]),
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
            min_size=1,
            max_size=30,
        ).map(" ".join),
    ),
    min_size=1,
    max_size=12,
)


@given(docs=zipf_corpora, top_k=st.sampled_from([3, 100]))
@settings(**SETTINGS)
def test_zipf_fit_matches_reference(spark, docs, top_k):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        zipf_fit_stats,
    )

    df = spark.createDataFrame(list(docs), "lang string, text string")
    expect = _zipf_ref(list(docs), top_k=top_k)
    got = {
        r["lang"]: (r["vocab_size"], r["n_fit"], r["zipf_slope"], r["zipf_r2"])
        for r in zipf_fit_stats(df, group_col="lang", top_k=top_k).collect()
    }
    assert got == expect


def test_zipf_fit_degenerate_cases(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        zipf_fit_stats,
    )

    # single distinct term: zero rank variance -> slope/r2 NULL, no crash
    df = spark.createDataFrame(
        [("en", "a a a a")], "lang string, text string"
    )
    row = zipf_fit_stats(df).collect()[0]
    assert row["vocab_size"] == 1 and row["n_fit"] == 1
    assert row["zipf_slope"] is None and row["zipf_r2"] is None
    # all counts equal: slope exactly 0, r2 NULL (zero y-variance)
    df2 = spark.createDataFrame(
        [("en", "a b c"), ("en", "b c a")], "lang string, text string"
    )
    row2 = zipf_fit_stats(df2).collect()[0]
    assert row2["zipf_slope"] == 0.0 and row2["zipf_r2"] is None
    # top_k < 2 rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        zipf_fit_stats(df, top_k=1)


# --- PSI segment drift vs brute-force reference ------------------------------


def _psi_ref(rows, width=4):
    """Brute force PSI with the same add-1 smoothing, global bucket set,
    and per-term nano-unit floor rounding."""
    import math
    from collections import Counter

    buckets = sorted({v // width for _, v in rows})
    nb = len(buckets)
    n_t = len(rows)
    tot = Counter(v // width for _, v in rows)
    out = {}
    for seg in sorted({s for s, _ in rows}):
        mine = Counter(v // width for s, v in rows if s == seg)
        n_s = sum(mine.values())
        acc = 0
        for b in buckets:
            p = 1.0 * (mine.get(b, 0) + 1) / (n_s + nb)
            q = 1.0 * (tot[b] + 1) / (n_t + nb)
            acc += math.floor(((p - q) * math.log(p / q)) * 1e9 + 0.5)
        out[seg] = (n_s, math.floor(acc / 1e9 * 1e6 + 0.5) / 1e6)
    return out


psi_corpora = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2"]),
        st.integers(min_value=0, max_value=63),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=psi_corpora)
@settings(**SETTINGS)
def test_psi_matches_reference(spark, rows):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.evaluation import (
        psi_segment_drift,
    )

    df = spark.createDataFrame(
        [(s, v) for s, v in rows], "source string, n_chars long"
    )
    expect = _psi_ref(rows, width=4)
    got = {
        r["source"]: (r["n_docs"], r["psi"])
        for r in psi_segment_drift(df, bucket_width=4).collect()
    }
    assert got == expect


def test_psi_degenerate_cases(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.evaluation import (
        psi_segment_drift,
    )

    # one global bucket: p = q = 1, PSI exactly 0
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "source string, n_chars long"
    )
    out = {r["source"]: r["psi"] for r in psi_segment_drift(df, bucket_width=100).collect()}
    assert out == {"a": 0.0, "b": 0.0}
    # a segment that IS the whole corpus: p == q everywhere, PSI 0
    solo = spark.createDataFrame(
        [("only", 5), ("only", 500), ("only", 70)],
        "source string, n_chars long",
    )
    row = psi_segment_drift(solo, bucket_width=64).collect()[0]
    assert row["psi"] == 0.0 and row["n_docs"] == 3
    # empty input: zero rows, no error
    empty = spark.createDataFrame([], "source string, n_chars long")
    assert psi_segment_drift(empty).count() == 0
    # bucket_width < 1 rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        psi_segment_drift(df, bucket_width=0)


# --- quality-gate ablation vs brute-force reference --------------------------


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — BOTH Spark's DIV and
    DuckDB's // truncate (verified on negative operands); Python's //
    floors, so the reference must not use it directly."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _gate_ablation_ref(docs):
    import math

    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        EN_STOPWORDS,
        QUALITY_W0_E6,
        QUALITY_W_AWL_E3,
        QUALITY_W_LEN_E3,
        QUALITY_W_PUNCT_E3,
        QUALITY_W_STOP_E3,
    )

    feats = []
    for text, n_chars in docs:
        toks = text.split(" ")
        n = len(toks)
        n_stop = sum(t in EN_STOPWORDS for t in toks)
        n_punct = sum(c in ".,;:!?" for c in text)
        e6 = lambda num, den: (
            math.floor(1.0 * num / den * 1e6 + 0.5) if den > 0 else 0
        )
        f = {
            "stop": (QUALITY_W_STOP_E3, e6(n_stop, n)),
            "punct": (QUALITY_W_PUNCT_E3, e6(n_punct, n_chars)),
            "len_sat": (QUALITY_W_LEN_E3, min(n, 100) * 10_000),
            "awl": (QUALITY_W_AWL_E3, e6(n_chars - (n - 1), n)),
        }
        logit = QUALITY_W0_E6 + sum(
            _tdiv(w * v, 1000) for w, v in f.values()
        )
        feats.append((f, logit))
    out = {}
    for name in ("stop", "punct", "len_sat", "awl"):
        n_docs = len(feats)
        n_kept = sum(lg >= 0 for _, lg in feats)
        flips = sum(
            (lg >= 0) != (lg - _tdiv(f[name][0] * f[name][1], 1000) >= 0)
            for f, lg in feats
        )
        w = feats[0][0][name][0] if feats else 0
        out[name] = (w, n_docs, n_kept, flips, 1_000_000 * flips // n_docs)
    return out


gate_docs = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from(
                ["the", "a", "of", "zzz", "wwww", "x.y,z!", "....", "qq"]
            ),
            min_size=1,
            max_size=120,
        ).map(" ".join),
    ),
    min_size=1,
    max_size=15,
)


@given(docs=gate_docs)
@settings(**SETTINGS)
def test_gate_ablation_matches_reference(spark, docs):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        quality_gate_ablation,
    )

    rows = [(t[0], len(t[0])) for t in docs]
    df = spark.createDataFrame(rows, "text string, n_chars long")
    expect = _gate_ablation_ref(rows)
    got = {
        r["feature"]: (
            r["weight_e3"],
            r["n_docs"],
            r["n_kept"],
            r["n_flip_without"],
            r["flip_rate_e6"],
        )
        for r in quality_gate_ablation(df).collect()
    }
    assert got == expect


def test_gate_ablation_degenerate_cases(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        quality_gate_ablation,
    )

    # empty input: zero rows, never a division error
    empty = spark.createDataFrame([], "text string, n_chars long")
    assert quality_gate_ablation(empty).count() == 0
    # identical docs: every feature flips all-or-nothing
    df = spark.createDataFrame(
        [("the the the", 11)] * 4, "text string, n_chars long"
    )
    out = quality_gate_ablation(df).collect()
    assert len(out) == 4
    for r in out:
        assert r["n_docs"] == 4
        assert r["n_flip_without"] in (0, 4)


# --- split leakage audit ------------------------------------------------------


def _ho(doc_id, frac=0.2, salt="split"):
    return _h60(f"{salt}{doc_id}") / float(1 << 60) < frac


leak_corpora = st.lists(
    st.sampled_from(
        [
            "alpha beta gamma delta epsilon zeta",
            "alpha beta gamma delta epsilon eta",
            "one two three four five six seven",
            "totally different words here now ok",
        ]
    ),
    min_size=2,
    max_size=16,
)


@given(texts=leak_corpora)
@settings(**SETTINGS)
def test_split_leakage_consistent_with_pair_join(spark, texts):
    """The audit's counts must equal classifying the (already
    property-tested) prefix-Jaccard pairs by the same hash split."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        shingle_jaccard_prefix_pairs,
        split_leakage_audit,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = shingle_jaccard_prefix_pairs(
        df, max_df=100, threshold_pct=50
    ).collect()
    n_cross = sum(
        _ho(r["id_a"]) != _ho(r["id_b"]) for r in pairs
    )
    leaky = {
        (r["id_a"] if _ho(r["id_a"]) else r["id_b"])
        for r in pairs
        if _ho(r["id_a"]) != _ho(r["id_b"])
    }
    n_held = sum(_ho(i) for i, _ in rows)
    got = split_leakage_audit(df).collect()[0]
    assert got["n_docs"] == len(rows)
    assert got["n_heldout"] == n_held
    assert got["n_pairs"] == len(pairs)
    assert got["n_cross_pairs"] == n_cross
    assert got["n_leaky_heldout_docs"] == len(leaky)
    expect_rate = (
        1_000_000 * len(leaky) // n_held if n_held > 0 else None
    )
    assert got["leak_rate_e6"] == expect_rate


def test_split_leakage_degenerate_cases(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        split_leakage_audit,
    )

    # holdout_fraction 0: empty heldout side -> leak_rate NULL, no crash
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id long, text string"
    )
    row = split_leakage_audit(df, holdout_fraction=0.0).collect()[0]
    assert row["n_heldout"] == 0 and row["leak_rate_e6"] is None
    # no near-dup pairs at all: a clean 0-leak report, not an error
    clean = spark.createDataFrame(
        [(1, "p q r s t u"), (2, "v w x y z zz")], "doc_id long, text string"
    )
    row2 = split_leakage_audit(clean).collect()[0]
    assert row2["n_pairs"] == 0
    assert row2["n_cross_pairs"] == 0
    assert row2["n_leaky_heldout_docs"] == 0


# --- unigram entropy vs brute-force reference ---------------------------------


def _entropy_ref(docs):
    import math
    from collections import Counter

    by = {}
    for lang, text in docs:
        by.setdefault(lang, Counter()).update(
            t for t in text.split(" ") if t != ""
        )
    out = {}
    for lang, tf in by.items():
        if not tf:
            continue
        n = sum(tf.values())
        hsum = sum(
            c * math.floor(math.log(n / c) * 1e6 + 0.5) for c in tf.values()
        )
        h = hsum / 1e6 / n
        ev = (
            math.floor(h / math.log(len(tf)) * 1e6 + 0.5) / 1e6
            if len(tf) > 1
            else None
        )
        out[lang] = (n, len(tf), math.floor(h * 1e6 + 0.5) / 1e6, ev)
    return out


@given(docs=zipf_corpora)
@settings(**SETTINGS)
def test_unigram_entropy_matches_reference(spark, docs):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        unigram_entropy_stats,
    )

    df = spark.createDataFrame(list(docs), "lang string, text string")
    expect = _entropy_ref(list(docs))
    got = {
        r["lang"]: (r["n_tokens"], r["vocab_size"], r["entropy"], r["evenness"])
        for r in unigram_entropy_stats(df).collect()
    }
    assert got == expect


def test_unigram_entropy_degenerate_cases(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        unigram_entropy_stats,
    )

    # single distinct term: H exactly 0, evenness NULL, no crash
    df = spark.createDataFrame([("en", "a a a")], "lang string, text string")
    row = unigram_entropy_stats(df).collect()[0]
    assert row["vocab_size"] == 1
    assert row["entropy"] == 0.0 and row["evenness"] is None
    # perfectly uniform two-term group: evenness exactly 1
    df2 = spark.createDataFrame([("en", "a b a b")], "lang string, text string")
    row2 = unigram_entropy_stats(df2).collect()[0]
    assert row2["evenness"] == 1.0


# --- label centroid separation vs brute-force reference -----------------------


def _sep_ref(rows):
    import math

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    comp = [
        (lbl, vid, [math.floor(x * 1e6 + 0.5) for x in vec])
        for vid, lbl, vec in rows
    ]
    labels = sorted({lbl for lbl, _, _ in comp})
    d = len(comp[0][2])
    cent = {}
    for L in labels:
        mine = [v for lbl, _, v in comp if lbl == L]
        cent[L] = [
            tdiv(sum(v[i] for v in mine), len(mine)) for i in range(d)
        ]
    nc = {L: sum(c * c for c in cent[L]) for L in labels}
    out = {}
    for L in labels:
        own_list, both_cnt, sb, nsep = [], 0, 0, 0
        for lbl, vid, v in comp:
            if lbl != L:
                continue
            nv = sum(x * x for x in v)

            def cos(cl):
                if nv > 0 and nc[cl] > 0:
                    dt = sum(x * c for x, c in zip(v, cent[cl]))
                    return math.floor(
                        (1.0 * dt) / math.sqrt((1.0 * nv) * (1.0 * nc[cl]))
                        * 1e6 + 0.5
                    )
                return None

            own = cos(L)
            others = [cos(cl) for cl in labels if cl != L]
            others = [o for o in others if o is not None]
            best = max(others) if others else None
            if own is not None:
                own_list.append(own)
            if own is not None and best is not None:
                both_cnt += 1
                sb += best
                if own > best:
                    nsep += 1
        n_vecs = sum(1 for lbl, _, _ in comp if lbl == L)
        avg_own = tdiv(sum(own_list), len(own_list)) if own_list else None
        avg_b = tdiv(sb, both_cnt) if both_cnt else None
        margin = (
            avg_own - avg_b if avg_own is not None and avg_b is not None
            else None
        )
        frac = 1_000_000 * nsep // both_cnt if both_cnt else None
        out[L] = (n_vecs, both_cnt, avg_own, avg_b, margin, frac)
    return out


sep_corpora = st.lists(
    st.tuples(
        st.sampled_from([0, 1, 2]),
        st.lists(
            st.floats(
                min_value=-2.0, max_value=2.0,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=4,
            max_size=4,
        ),
    ),
    min_size=1,
    max_size=12,
)


@given(vecs=sep_corpora)
@settings(**SETTINGS)
def test_label_separation_matches_reference(spark, vecs):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        label_centroid_separation,
    )

    rows = [(i, lbl, v) for i, (lbl, v) in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    expect = _sep_ref(rows)
    got = {
        r["label"]: (
            r["n_vecs"],
            r["n_scored"],
            r["avg_intra_cos_e6"],
            r["avg_inter_best_cos_e6"],
            r["margin_e6"],
            r["frac_separated_e6"],
        )
        for r in label_centroid_separation(df).collect()
    }
    assert got == expect


def test_label_separation_degenerate_cases(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        label_centroid_separation,
    )

    # single label: no other centroid -> inter/margin/frac NULL, no error
    df = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [0.0, 1.0])],
        "vec_id long, label int, embedding array<double>",
    )
    row = label_centroid_separation(df).collect()[0]
    assert row["n_vecs"] == 2 and row["n_scored"] == 0
    assert row["avg_inter_best_cos_e6"] is None
    assert row["margin_e6"] is None and row["frac_separated_e6"] is None
    # zero-norm member: dropped from the scored set, never a division error
    df2 = spark.createDataFrame(
        [(1, 0, [0.0, 0.0]), (2, 0, [1.0, 0.0]), (3, 1, [0.0, 1.0])],
        "vec_id long, label int, embedding array<double>",
    )
    out = {r["label"]: r for r in label_centroid_separation(df2).collect()}
    assert out[0]["n_vecs"] == 2 and out[0]["n_scored"] == 1


# --- padding waste curve vs brute-force reference ------------------------------


@given(
    lens=st.lists(st.integers(min_value=1, max_value=600), min_size=1, max_size=30),
    seq_lens=st.sampled_from([(4,), (4, 16), (128, 256, 512)]),
)
@settings(**SETTINGS)
def test_padding_waste_matches_reference(spark, lens, seq_lens):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.chunking import (
        padding_waste_curve,
    )

    rows = [(" ".join("w" for _ in range(n)),) for n in lens]
    df = spark.createDataFrame(rows, "text string")
    got = {
        r["seq_len"]: (
            r["n_docs"],
            r["n_seqs"],
            r["data_tokens"],
            r["padding_tokens"],
            r["waste_e6"],
        )
        for r in padding_waste_curve(df, seq_lens=seq_lens).collect()
    }
    expect = {}
    for L in seq_lens:
        pads = [(L - n % L) % L for n in lens]
        seqs = [(n + L - 1) // L for n in lens]
        data, pad = sum(lens), sum(pads)
        expect[L] = (
            len(lens),
            sum(seqs),
            data,
            pad,
            1_000_000 * pad // (data + pad),
        )
    assert got == expect


def test_padding_waste_degenerate_cases(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.chunking import (
        padding_waste_curve,
    )

    # empty corpus: zero rows, never a division error
    empty = spark.createDataFrame([], "text string")
    assert padding_waste_curve(empty).count() == 0
    # every doc exactly L tokens: zero waste
    df = spark.createDataFrame([("a b c d",), ("e f g h",)], "text string")
    row = {r["seq_len"]: r for r in padding_waste_curve(df, seq_lens=(4,)).collect()}[4]
    assert row["padding_tokens"] == 0 and row["waste_e6"] == 0
    assert row["n_seqs"] == 2
    # invalid seq_lens rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        padding_waste_curve(df, seq_lens=(0,))
    with _pytest.raises(ValueError):
        padding_waste_curve(df, seq_lens=())
