"""Gate-selectivity invariants (VERDICT r10 task 3).

The r9→r10 vacuous-gate incident: ``quality_linear_filter``'s pinned
bias (then −900k) kept ZERO documents at every test scale, which made
``curation_pipeline_v3``'s quality stage a silent no-op — and every
DuckDB hash still matched, because the oracle encodes the same vacuous
predicate. Oracle parity proves engine agreement, NOT semantic
meaningfulness. These tests pin the latter: every calibrated gate /
sampler must be *selective* at sf0.01 — keep a non-trivial fraction,
drop a non-trivial remainder — so a future recalibration of a pinned
constant can never ship degenerate again.

Each assertion names the pinned constant it guards (the constant's
definition comments point back here).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import TESTDATA_ORACLE


def _q(name):
    from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import QUERIES

    return QUERIES[name].fn


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA_ORACLE}/documents.parquet").cache()


def test_quality_linear_filter_keeps_nontrivial_fraction(spark, docs):
    """Guards QUALITY_W0_E6 (operators/textstats.py): the linear gate
    must separate the corpus — kept fraction strictly inside (0, 1)."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (
        quality_linear_filter,
    )

    agg = quality_linear_filter(docs).agg(
        F.count("*").alias("n"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
    ).collect()[0]
    assert agg.n > 0
    assert 0 < agg.n_kept < agg.n, (
        f"quality gate degenerate: kept {agg.n_kept}/{agg.n} — "
        "recalibrate QUALITY_W0_E6 (see the r9 vacuous-gate incident)"
    )
    # and not merely an epsilon sliver: at least 5% kept AND 5% dropped
    assert 0.05 * agg.n <= agg.n_kept <= 0.95 * agg.n


def test_quality_perplexity_cut_is_selective(spark, docs):
    """Guards _PPL_CUT_E4 (plans/battery.py): the LM cut must drop >0
    docs and keep >0 docs at sf0.01."""
    out = _q("quality_perplexity_cut")(spark, TESTDATA_ORACLE)
    kept = out.agg(F.sum("n_docs")).collect()[0][0]
    total = docs.count()
    assert kept and kept > 0, "perplexity cut kept nothing"
    assert kept < total, "perplexity cut dropped nothing — cut is vacuous"


def test_mixture_sample_langs_emits_multiple_languages(spark):
    """Guards _MIX_WEIGHTS: the rebalance sample must retain >1 language
    and be a strict subsample."""
    out = _q("mixture_sample_langs")(spark, TESTDATA_ORACLE)
    langs = out.select("lang").distinct().count()
    assert langs > 1, f"mixture sample collapsed to {langs} language(s)"


def test_temperature_mixture_weights_spread(spark):
    """Guards alpha=0.3 pin: temperature weights must cover >1 language
    with non-degenerate (all-equal-to-zero) per-doc weights."""
    out = _q("mixture_temperature_weights")(spark, TESTDATA_ORACLE)
    rows = out.collect()
    assert len(rows) > 1, "temperature mixture saw a single language"
    assert all(r.per_doc_weight > 0 for r in rows)


def test_curation_v3_keeps_and_drops(spark, docs):
    """curation_pipeline_v3's rollup must show nonzero quality-kept AND
    nonzero quality-dropped (kept < corpus) — the exact invariant the
    r9 incident violated."""
    out = _q("curation_pipeline_v3")(spark, TESTDATA_ORACLE)
    kept = out.agg(F.sum("n_quality_kept")).collect()[0][0]
    total = docs.count()
    assert kept and kept > 0, "v3 quality gate kept zero docs (vacuous)"
    assert kept < total, "v3 quality gate dropped zero docs (vacuous)"


def test_curation_v4_keeps_and_drops(spark):
    """curation_pipeline_v4 reports n_docs_in vs n_docs_kept per lang —
    totals must show a real gate (0 < kept < in)."""
    out = _q("curation_pipeline_v4")(spark, TESTDATA_ORACLE)
    agg = out.agg(
        F.sum("n_docs_in").alias("n_in"),
        F.sum("n_docs_kept").alias("n_kept"),
    ).collect()[0]
    assert agg.n_kept and agg.n_kept > 0
    assert agg.n_kept < agg.n_in


def test_quality_auc_audit_is_nontrivial(spark):
    """The AUC audit must carry signal: a label whose AUC sits at the
    coin-flip line is a vacuous audit (the lang='en' label measured
    ~0.50 at sf0.01 and was rejected at design time; the shipped
    LM-cut-survivor label measures ~0.76)."""
    row = _q("quality_auc_audit")(spark, TESTDATA_ORACLE).collect()[0]
    assert row.n_pos > 0 and row.n_neg > 0
    assert row.auc_e6 >= 600_000, (
        f"quality AUC degenerated to {row.auc_e6/1e6:.3f} — the gate no "
        "longer orders the LM-cut classes; check the pinned weights"
    )


def test_dsir_weights_spread(spark, docs):
    """DSIR importance weights must separate documents (non-constant)
    and cover every doc with a non-empty token stream."""
    out = _q("dsir_importance_weights")(spark, TESTDATA_ORACLE)
    agg = out.agg(
        F.count("*").alias("n"),
        F.min("logratio_e6").alias("lo"),
        F.max("logratio_e6").alias("hi"),
    ).collect()[0]
    assert agg.n > 0
    assert agg.lo < agg.hi, "DSIR weights are constant — buckets vacuous"


def test_matryoshka_overlap_rows_per_query(spark):
    """One row per query with overlap in [0, 5]."""
    rows = _q("embed_matryoshka_overlap")(spark, TESTDATA_ORACLE).collect()
    assert len(rows) == 10
    assert all(0 <= r.n_overlap <= 5 for r in rows)


def test_curation_v5_keeps_and_drops(spark, docs):
    """Guards _DSIR_FLOOR_E6: v5's importance floor must resample a
    non-trivial fraction of gate survivors — neither zero nor all."""
    out = _q("curation_pipeline_v5")(spark, TESTDATA_ORACLE)
    agg = out.agg(
        F.sum("n_gate_kept").alias("kept"),
        F.sum("n_resampled").alias("res"),
    ).collect()[0]
    assert agg.kept and agg.kept > 0
    assert 0 < agg.res < agg.kept, (
        f"v5 importance floor degenerate: {agg.res}/{agg.kept} — "
        "recalibrate _DSIR_FLOOR_E6"
    )
    assert 0.05 * agg.kept <= agg.res <= 0.95 * agg.kept


def test_sketch_merge_parity_law_holds(spark):
    """The KMV monoid law must hold for EVERY source — a single False
    row means kmv_merge or kmv_registers broke the k-smallest-of-union
    invariant."""
    rows = _q("sketch_merge_parity")(spark, TESTDATA_ORACLE).collect()
    assert rows
    assert all(r.merged_equals_whole for r in rows)


def test_ngram_novelty_curve_has_signal(spark):
    """Guards the 20% split + max_n=3 pins (plans/battery.py
    ngram_novelty_audit): the audit is only meaningful if the curve
    SEPARATES — shared vocabulary at n=1 (novelty ~0) and genuine
    novelty strictly inside (0, 1e6) at n=3. A corpus where n=3 reads
    0 or 1e6 for every group makes the audit vacuous (the r9 lesson:
    hash parity alone proves nothing about signal)."""
    rows = _q("ngram_novelty_audit")(spark, TESTDATA_ORACLE).collect()
    assert rows
    by_n = {}
    for r in rows:
        by_n.setdefault(r.n, []).append(r.novelty_e6)
    # vocabulary is shared: unigram novelty at most 5%
    assert max(by_n[1]) <= 50_000
    # trigram novelty carries real signal for at least one group
    assert any(0 < v < 1_000_000 for v in by_n[3])
    # and the curve is monotone on the group averages
    avg = {n: sum(vs) / len(vs) for n, vs in by_n.items()}
    assert avg[1] <= avg[2] <= avg[3]


def test_waterfill_caps_are_binding(spark):
    """Guards the 3/4-budget pin: the solver must actually CAP someone
    (head domains clipped) and leave someone uncapped (tail taken
    whole) — an all-capped or none-capped solution means the budget pin
    stopped exercising the waterfill. (The first cut pinned total div 2
    and THIS test caught it all-capped at sf0.01 before it shipped —
    the r9 vacuous-gate lesson working as designed.)"""
    rows = _q("mixture_waterfill_caps")(spark, TESTDATA_ORACLE).collect()
    assert rows
    capped = [r for r in rows if r.is_capped]
    assert 0 < len(capped) < len(rows)
    level = {r.water_level for r in rows}
    assert len(level) == 1  # one shared water level on every row
    tau = level.pop()
    assert tau is not None
    for r in rows:
        assert r.alloc_tokens == (tau if r.is_capped else r.n_tokens)
        if r.is_capped:
            assert r.n_tokens > tau


def test_substring_coverage_nonvacuous(spark):
    """Guards the k=8 pin: the corpus must show SOME duplicated-span
    coverage (else the entry measures nothing) without being saturated
    (coverage ~1e6 would mean k is too small to discriminate)."""
    rows = _q("dedup_substring_coverage")(spark, TESTDATA_ORACLE).collect()
    assert rows
    total_cov = sum(r.covered_tokens for r in rows)
    total_tok = sum(r.total_tokens for r in rows)
    assert total_cov > 0, "no duplicated 8-gram coverage anywhere - vacuous"
    assert total_cov < 0.5 * total_tok, "coverage saturated - k too small"


def test_curation_v6_every_stage_bites(spark):
    """Guards v6's composition against vacuous stages (the r9 lesson):
    on the oracle fixture the gate must reject docs, the near-dup drop
    must remove docs FROM THE GATE SURVIVORS, and the waterfill cap
    must leave docs unselected in at least one lang. An exact-dedup
    stage here would be vacuous (this corpus has zero exact dups —
    measured before v6 shipped); the near-dup drop is the stage that
    bites."""
    rows = _q("curation_pipeline_v6")(spark, TESTDATA_ORACLE).collect()
    assert rows
    n_in = sum(r["n_docs_in"] for r in rows)
    n_gate = sum(r["n_gate_kept"] for r in rows)
    n_dedup = sum(r["n_dedup_kept"] for r in rows)
    n_sel = sum(r["n_docs_sel"] or 0 for r in rows)
    assert n_gate < n_in          # the gate bites
    assert n_dedup < n_gate       # the near-dup drop bites
    assert n_sel < n_dedup        # the budget cap bites
    for r in rows:
        if r["alloc_tokens"] is not None:
            assert (r["realized_tokens"] or 0) <= r["alloc_tokens"]
