"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full computation, no driver
collect, no disk write) so timings measure the query plan, not result
materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

HEADLINE = [
    "pricing_summary",
    "devig_proportional",
    "devig_power",
    "best_price_per_order",
    "best_odds_report_join",
    "arbitrage_scan",
    "rolling_avg_events",
    "lead_target_events",
    "ev_battery",
    "odds_format_normalize",
    "backtest_roi",
    "accuracy_metric",
    "snapshot_union",
    "customer_order_rollup",
    "topk_orders",
    "flagship_market_report",
    # north-star training-data ops (documents/embeddings tables)
    "text_token_stats",
    "text_quality",
    "text_language_id",
    "text_fingerprint",
    "dedup_exact",
    "dedup_shingle_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "embed_cosine_topk",
    "embed_hard_negatives",
    "embed_ann_lsh",
    "embed_cosine_dup_pairs",
    "multimodal_payload_stats",
    "multimodal_image_features",
    "multimodal_frame_sample",
    "multimodal_audio_duration",
    "nested_explode_flatten",
    "forecast_linear_ols",
    "json_props_rollup",
    "event_sessionize",
    "value_percentiles",
    "tfidf_top_terms",
    "kmv_distinct_sketch",
    "asof_join_marks",
    "pivot_event_cents",
    "salted_agg_parity",
    "orders_vs_customer_avg",
    "order_price_deciles",
    "session_click_purchase_funnel",
    "rollup_pricing",
    "ohlc_hourly_bars",
    "range_join_concurrent_sessions",
    "sample_events_hash",
    "sample_events_stratified",
    "iceberg_heavy_users",
    "text_unigram_perplexity",
    # r11: the rows-only sketch entries were replaced by hash-oracled
    # verified twins (same native aggregates + the guarantee boolean)
    "hll_distinct_verified",
    "approx_percentile_verified",
    "embed_ivf_ann",
    "curation_pipeline",
    "countmin_frequency",
    "decontaminate_benchmark",
    "bloom_join_prune",
    "path_funnel_regex",
    "chunk_documents_overlap",
    "pii_redaction",
    "repetition_quality",
    "mixture_sample_langs",
    "incremental_rollup_merge",
    "zorder_layout_pruning",
    "inverted_text_index",
    "embed_quantize_int8",
    "embed_quantized_topk",
    "q5_local_supplier_revenue",
    "profile_orders_table",
    "feature_correlation_screen",
    "curation_pipeline_v2",
    "order_price_relative_rank",
    "misra_gries_heavy_hitters",
    "scd2_user_state_intervals",
    "cohort_weekly_retention",
    "kfold_split_audit",
    "rfm_user_segments",
    "time_to_convert",
    "twap_user_value",
    "misra_gries_verified",
    "dedup_incremental_minhash",
    "dedup_incremental_compacted",
    "bucketed_join_colocated",
    "canonical_schema_evolution",
    "pack_sequence_spans",
    "hll_group_registers",
    "training_shard_manifest",
    "weighted_systematic_sample",
    "snapshot_table_diff",
    "source_reputation",
    "skew_key_report",
    "referential_integrity_audit",
    "ewma_user_value",
    "embed_mean_pool",
    "dedup_normalized_exact",
    "quality_perplexity_cut",
    "orders_price_histogram",
    "customers_without_orders",
    "cube_pricing",
    "event_gap_detection",
    "customers_with_big_orders",
    "feature_standardize",
    "q6_promo_revenue",
    "q3_shipping_priority",
    "monthly_active_users",
    "weekday_hour_heatmap",
    "vocab_coverage",
    "q4_order_priority",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_type_share",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q19_disjunctive_pricing",
    "triangle_knn_cosupply",
    "user_trend_ols",
    "mad_outlier_events",
    "rolling_active_users_7d",
    "pareto_supplier_share",
    "event_transition_matrix",
    "unpivot_order_measures",
    "purchase_click_attribution",
    "q8_nation_market_share",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q21_sole_latest_shipper",
    "q22_idle_customer_balance",
    # kmeans is a STATIC 2-iteration unrolled plan (one job), unlike the
    # excluded loop-until-fixpoint entries below
    "kmeans_embeddings_lloyd",
    "pmi_bigram_collocations",
    "weighted_median_price",
    "table_checksum_audit",
    "grouping_sets_pricing",
    "concurrency_sweep_line",
    "chi_square_drift",
    "benford_first_digit_audit",
    "null_skew_left_join",
    "variant_props_extract",
    "forward_fill_gaps",
    "fuzzy_name_match",
    "session_window_native",
    "yoy_monthly_growth",
    "cusum_changepoint",
    "acf_daily_autocorrelation",
    "copurchase_lift_pairs",
    "entropy_source_mix",
    "gini_order_concentration",
    "kaplan_meier_conversion",
    "bm25_scoring",
    "abtest_proportion_ztest",
    "seasonal_weekday_index",
    "theil_sen_user_trend",
    "ridge_forecast_closed_form",
    "seasonal_anomaly_days",
    "set_ops_churn_audit",
    "range_frame_trailing_hour",
    "multi_touch_attribution",
    "activity_bitmap_days",
    "brand_price_realization",
    "hll_rolling_7d_users",
    "kl_term_drift",
    "text_bigram_perplexity",
    "frequent_event_trigrams",
    "zipf_rank_frequency_fit",
    "pit_state_lookup",
    "theil_sen_banded",
    "embedding_quality_audit",
    "holt_linear_user_value",
    "winsorized_event_stats",
    "quantile_normalize_events",
    "date_spine_zero_fill",
    "lorenz_curve_orders",
    "ship_latency_by_priority",
    "markov_steady_state_power",
    "merge_upsert_orders",
    "ivf_centroid_refresh",
    "dedup_sorted_neighborhood",
    "skyline_supplier_frontier",
    "skyline_orders_3d",
    "dedup_substring_spans",
    "dedup_substring_clip",
    "dedup_incremental_substring",
    "embed_ann_recall_audit",
    "contamination_kmv_audit",
    # r9 families (all probed on arrival — SCALING.md round-9):
    "dedup_winnow_fingerprints",
    "dedup_winnow_match_pairs",
    "embed_pq_codes",
    "embed_pq_adc_topk",
    "embed_ivfpq_topk",
    "embed_semdedup_keep",
    # bpe rounds run in the builder (BUILDER_DOES_CLUSTER_WORK) — the
    # 3 checkpointed rounds ARE the operator under test here, unlike
    # the excluded loop-until-fixpoint entries whose round count varies
    "text_bpe_merges",
    "multimodal_cdc_chunks",
    "multimodal_cdc_dedup_stats",
    "quality_linear_filter",
    "dedup_soft_weights",
    "curation_pipeline_v3",
    # r10 families (probed on arrival — SCALING.md round-10). The two
    # BPE-consuming entries run the checkpointed merge rounds in the
    # builder (BUILDER_DOES_CLUSTER_WORK, like text_bpe_merges).
    # embed_ivfpq_precoded_topk deliberately does NOT count its builder:
    # the eager index build is the once-paid stored-column cost, and the
    # timed query-over-ints wall is the entry's claim (SCALING.md r10).
    "text_bpe_encode",
    # r11: the ranked-kernel apply twin (same builder convention)
    "text_bpe_encode_ranked",
    "pack_bpe_sequence_spans",
    "embed_ivfpq_precoded_topk",
    "hybrid_rrf_fusion",
    "text_distinct_ngrams",
    "mixture_temperature_weights",
    "dedup_incremental_winnow",
    # MMR's k greedy rounds run checkpointed in the builder — they ARE
    # the operator under test (the text_bpe_merges rationale)
    "embed_mmr_rerank",
    "dedup_lsh_recall_audit",
    "text_bpe_fertility",
    "language_id_confusion",
    "curation_pipeline_v4",
    # r11 additions (probed on arrival — SCALING.md round-11)
    "dsir_importance_weights",
    "quality_auc_audit",
    "embed_matryoshka_overlap",
    "curation_pipeline_v5",
    "sketch_merge_parity",
    "weighted_sample_es_topk",
    # r12 additions (probed on arrival — SCALING.md round-12)
    "ngram_novelty_audit",
    "mixture_waterfill_caps",
    "dedup_substring_coverage",
    "mixture_cap_prefix_fill",
    "text_zipf_fit",
    "source_length_psi",
    "embed_ivfpq_refine_topk",
    "quality_gate_ablation",
    "split_leakage_audit",
    "curation_pipeline_v6",
    "text_unigram_entropy_audit",
    "embed_label_separation",
    "pack_padding_waste_curve",
    # r13 additions (probed on arrival — SCALING.md round-13)
    "embed_contamination_audit",
    "text_bpe_vocab_coverage",
    # streaming_* entries (incl. streaming_incremental_rollup) excluded:
    # they stage snapshot files per call
    # (measured by their oracle-checked correctness runs instead).
    # forecast_random_forest / dedup_cluster_assign / dedup_cluster_star /
    # dedup_cluster_size_histogram /
    # leakage_safe_split / pagerank_customer_supplier /
    # hierarchy_root_depth /
    # recursive_cte_walk / kcore_cosupply_peel excluded: iterative MLlib
    # fit / loop-until-fixpoint / pointer-doubling / level-per-round
    # recursion / per-round checkpointed peeling — wall time is dominated
    # by scheduling, not the operators under test.
    # dedup_cluster_soft_weights excluded for the same reason (its CC
    # fixpoint is the dedup_cluster_assign loop; the weight window it
    # adds is one exchange, covered by the plan pin).
    # dedup_shingle_jaccard_all excluded: the exhaustive enumerator kept
    # as the prefix-filtered entry's oracle twin — benching both would
    # double-count the same corpus pass.
]


# Entries whose query-builder fn() runs real jobs (writes tables /
# commits versions) before returning the result DataFrame — their
# timings must include that work.
BUILDER_DOES_CLUSTER_WORK = {
    "bucketed_join_colocated",
    "canonical_schema_evolution",
    # merge_into's builder runs the eager source precondition aggregate
    # (uniqueness + size over the change batch) — mandatory merge work,
    # so the timer must include it (matches the SCALING.md probe, which
    # times fn()+action for this entry).
    "merge_upsert_orders",
    # bpe_merge_rounds localCheckpoints each merge round (lineage
    # truncation, the kcore/pagerank discipline) — the rounds run
    # eagerly inside fn(), so the timer must start before it. (Eager
    # precondition GUARDS — semdedup/skyline/theil-sen 1-row
    # aggregates — stay excluded per the existing convention above;
    # kcore/pagerank's checkpointed rounds likewise predate this set
    # and keep their established timing.)
    "text_bpe_merges",
    # r10: both BPE-consuming entries run the same checkpointed rounds
    "text_bpe_encode",
    "text_bpe_encode_ranked",
    "pack_bpe_sequence_spans",
    "text_bpe_fertility",
    "language_id_confusion",
    "curation_pipeline_v4",
    "embed_mmr_rerank",
    # r12: v6 localCheckpoints the dedup-survivor set (the stage
    # boundary) — the gate + pair join run eagerly inside fn()
    "curation_pipeline_v6",
    # r13: the vocab-coverage audit runs the same checkpointed BPE
    # induction rounds as text_bpe_encode
    "text_bpe_vocab_coverage",
}


def calib_drift(start: dict, end: dict) -> float | None:
    """Max relative drift between the start-of-battery and end-of-battery
    calibration passes (r7 review task 7): |end−start| / start over the
    cpu and shuffle yardsticks (the floor is a min-of-4 lower bound, not
    a drift signal). > 0.20 means the HOST moved mid-run — per-query
    deltas from that run are not comparable to other rounds, recorded as
    an artifact instead of requiring manual re-measurement (the r6
    unigram and r7 join adjudications, automated)."""
    rel = [
        abs(end[k] - start[k]) / start[k]
        for k in ("calib_md5_sec", "calib_shuffle_sec")
        if start.get(k) and k in end
    ]
    return round(max(rel), 3) if rel else None


def drift_corrected(
    timings: dict[str, float], y_start: float, y_end: float
) -> dict[str, float]:
    """Per-query drift-corrected seconds: the host speed is modeled as
    the md5+shuffle yardstick linearly interpolated by CUMULATIVE
    ELAPSED battery seconds (r11 advice — index interpolation let a few
    very slow entries skew where the drift was attributed) between the
    start and end calibration passes, and every query is re-expressed
    at START-of-run host speed:
    ``corrected(q) = raw(q) * y_start / lerp(y_start, y_end, mid(q)/T)``
    where ``mid(q)`` is the query's midpoint in cumulative raw seconds
    and ``T`` the battery's raw total. ``timings`` must preserve battery
    execution order (insertion order). Degenerate yardsticks pass raw
    through: y_start <= 0 disables correction for the WHOLE dict (r11
    advice — the old per-entry yard_i>0 guard silently scaled later
    entries by ~0 when y_start=0 with y_end>0), as does a non-positive
    interpolant at any point.
    """
    total = sum(timings.values())
    if y_start <= 0 or total <= 0:
        return {q: sec for q, sec in timings.items()}
    out: dict[str, float] = {}
    elapsed = 0.0
    for qname, sec in timings.items():
        frac = (elapsed + sec / 2.0) / total
        elapsed += sec
        yard_i = y_start + (y_end - y_start) * frac
        out[qname] = round(sec * y_start / yard_i, 3) if yard_i > 0 else sec
    return out


def compact_bench_line(
    base: dict,
    timings: dict,
    budget: int = 1800,
    corrected: dict | None = None,
) -> str:
    """Render the stdout bench line: ``base`` plus the slowest queries
    that fit in ``budget`` chars, the rest rolled up into
    ``queries_omitted``/``queries_omitted_sec``. The loop ends at keep=0
    (no per-query detail at all), so the line fits the driver's ~2000-char
    tail capture at ANY battery size — unit-tested with a 250-name fake
    registry (r6 review task 6).

    When ``corrected`` (the drift-corrected per-query seconds) is given,
    the SAME kept names also ride as ``queries_drift_corrected`` (r12
    review task 5: the driver-captured line used to carry raw times
    only, so an external reader of a drift-flagged round had no way to
    correct them; halving the kept-name count is the accepted cost —
    every name still appears in the full line on stderr and
    BENCH.local.json)."""
    by_cost = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    line = None
    for keep in range(len(by_cost), -1, -1):
        obj = {**base, "queries": dict(sorted(by_cost[:keep]))}
        omitted = by_cost[keep:]
        if omitted:
            obj["queries_omitted"] = len(omitted)
            obj["queries_omitted_sec"] = round(sum(v for _, v in omitted), 3)
        if corrected is not None:
            obj["queries_drift_corrected"] = {
                name: corrected[name]
                for name, _ in sorted(by_cost[:keep])
                if name in corrected
            }
            if omitted:
                obj["queries_omitted_corrected_sec"] = round(
                    sum(corrected.get(n, v) for n, v in omitted), 3
                )
        line = json.dumps(obj, separators=(",", ":"))
        if len(line) <= budget:
            break
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import QUERIES
    from sports_data_integration_and_forecasting_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Warm the JVM/codegen paths once with a trivial action.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Machine calibration: a fixed data-independent workload (50M
    # string-md5 hashes, the battery's dominant primitive) so
    # round-over-round totals can be normalized for host-speed drift (the
    # same battery measured 2-3x slower wall-clock between rounds on
    # nominally identical 32-cpu hosts). The plan is REBUILT per run —
    # re-executing one Dataset instance reuses its AQE-materialized
    # stages and measures nothing — and driven through the same noop sink
    # as the queries; second run reported (same convention as below).
    from pyspark.sql import functions as _F

    def _calib_cpu_df():
        h = _F.md5(_F.concat(_F.lit("calib"), _F.col("id").cast("string")))
        # bit_xor: overflow-free under ANSI mode, still forces every hash
        return spark.range(50_000_000).select(_F.bit_xor(_F.xxhash64(h)))

    def _calib_shuffle_df():
        # 64 tasks -> 4096-key exchange -> count: measures task-scheduling
        # + shuffle overhead, the dimension slow hosts inflate first
        return (
            spark.range(0, 1_000_000, 1, 64)
            .groupBy((_F.col("id") % 4096).alias("k"))
            .agg(_F.count("*").alias("n"))
        )

    def _calib_floor_df():
        # near-empty query: measures the per-query fixed floor (driver
        # planning + AQE loop + job/stage scheduling) that every battery
        # entry pays regardless of plan quality. At sf0.1 this floor
        # times the query count is most of the battery total, and it
        # tracks NEITHER the cpu nor the shuffle calibration — so
        # cross-round work comparisons must subtract it (normalized_work
        # below).
        return (
            spark.range(0, 1_000, 1, 8)
            .groupBy((_F.col("id") % 10).alias("k"))
            .agg(_F.count("*").alias("n"))
        )

    def _run_calibration() -> dict:
        # cpu/shuffle: second run reported (steady state). NOTE this
        # convention is intentionally FROZEN even though r6 measured it
        # wobbling ±15% run-over-run (single GC/steal spikes): rounds
        # 4-6 all published normalized_total under it, and switching to
        # min-of-steady mid-series deflates the yardstick ~20% — an
        # r6 trial run moved normalized_total 23.7 → 30.6 with an
        # unchanged battery, which reads as a fake regression. Treat
        # normalized_total as comparable only under one convention;
        # single-run wobble up to ±20% is measurement, not battery.
        # r7 confirmed on identical code, same host, minutes apart: raw
        # total 74.1 vs 72.4 (2%) while normalized_total swung 32.1 vs
        # 23.6 — calib_shuffle alone doubled (0.50 vs 1.01). Raw total
        # is the stable signal; per-query deltas under ±25% and any
        # normalized digit are noise. Real regressions are decided by
        # same-session back-to-back probes (SCALING.md), never by
        # cross-round bench-line diffs.
        # floor: MIN of four runs — it estimates a lower bound (the
        # fixed per-query cost), and a single sample is at the mercy of
        # hypervisor-steal spikes (observed 7x inflation on an
        # otherwise idle box), which then nonsensically zeroes
        # normalized_work.
        out = {}
        for key, mk in [("calib_md5_sec", _calib_cpu_df),
                        ("calib_shuffle_sec", _calib_shuffle_df),
                        ("calib_floor_sec", _calib_floor_df)]:
            runs = 4 if key == "calib_floor_sec" else 2
            samples = []
            for _ in range(runs):
                df = mk()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
            out[key] = (
                min(samples) if key == "calib_floor_sec" else samples[-1]
            )
        return out

    calib = _run_calibration()

    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import release_caches

    timings: dict[str, float] = {}
    for i, name in enumerate(HEADLINE):
        spec = QUERIES.get(name)
        if spec is None:
            continue
        # Three runs; report the MIN of the two steady-state runs. The
        # first execution pays one-off plan compilation / codegen /
        # Python-worker spin-up (measured at 1.5-4 s per query), which a
        # steady-state engine never re-pays, so it never counts. Of the
        # remaining runs the MIN is the honest steady-state estimate:
        # reporting a single "second run" left cache-heavy entries at the
        # mercy of mid-battery GC/cleaner spikes (r5 measured
        # misra_gries_verified at 2.2 s mid-battery vs 0.5 s isolated —
        # pure interference from the 100+ preceding unrelated queries,
        # which no real engine deployment replays between runs).
        # For entries whose BUILDER performs real cluster work (bucketed
        # table writes, versioned-table commits) the timer starts before
        # spec.fn() so that work isn't free; for the rest fn() is pure
        # plan construction — py4j driver overhead (seconds for the
        # 128-column signature trees), one-off and amortized at scale —
        # and timing it would drown the engine-throughput signal the
        # bench exists to measure.
        runs = []
        for _ in range(3):
            if name in BUILDER_DOES_CLUSTER_WORK:
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
            else:
                df = spec.fn(spark, sf_dir)
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs[1:])
        # Drop this entry's scoped caches before the next entry: a
        # steady-state engine wouldn't hold a predecessor's signature
        # tables either, and the leftover blocks otherwise add memory/GC
        # pressure that inflates later entries (measured: the prefix
        # jaccard ran ~30% slower mid-battery than isolated).
        release_caches()
        # Periodic full GC: broadcast blocks and shuffle state from ~10
        # entries' worth of queries otherwise age into the old gen and
        # surface as multi-second pauses INSIDE later timed runs.
        if i % 10 == 9:
            spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Calibrate at BOTH ends (r7 review task 7): a second identical
    # calibration pass after the battery, published as calib_end_*, plus
    # the max relative cpu/shuffle drift. calib_drift_flag > 0.20 means
    # the host moved mid-run and this run's per-query deltas are not
    # comparable across rounds — the adjudication artifact that used to
    # require manual back-to-back re-measurement.
    calib_end_raw = _run_calibration()
    calib_end = {k.replace("calib_", "calib_end_"): v
                 for k, v in calib_end_raw.items()}
    drift = calib_drift(calib, calib_end_raw)
    calib_end["calib_drift"] = drift
    calib_end["calib_drift_flag"] = bool(drift is not None and drift > 0.20)
    # Host-drift normalization (round-4 review task): the same battery
    # measured 2-3x different wall-clock on nominally identical hosts
    # across rounds, so raw totals aren't comparable round-over-round.
    # The yardstick blends the two calibration workloads (fixed CPU-bound
    # md5 pass + fixed shuffle/scheduling pass — the two dimensions slow
    # hosts inflate); normalized_total = total / yardstick is a
    # dimensionless host-independent figure to compare across rounds.
    yardstick = calib["calib_md5_sec"] + calib["calib_shuffle_sec"]
    normalized = round(total / yardstick, 3) if yardstick > 0 else None
    # Per-query drift-corrected seconds (r10 review task 5): the bench
    # is one pass, so a host that slows down mid-run (calib_drift_flag)
    # inflates LATE entries relative to EARLY ones and cross-round
    # per-query diffs conflate battery position with real regressions
    # (the r10 adjudication list was exactly this artifact). Model the
    # host speed as the md5+shuffle yardstick linearly interpolated by
    # battery position between the start and end calibrations, and
    # express every query at START-of-run host speed:
    #   corrected(i) = raw(i) * y_start / lerp(y_start, y_end, i/(N-1)).
    # Round-over-round adjudication (r11+) compares THESE numbers;
    # raw seconds stay the published headline.
    y_end = (
        calib_end_raw["calib_md5_sec"] + calib_end_raw["calib_shuffle_sec"]
    )
    corrected = drift_corrected(timings, yardstick, y_end)
    # Work component with the per-query scheduling floor subtracted, in
    # units of the CPU yardstick: the host- and query-count-independent
    # figure for round-over-round regression checks.
    work = total - len(timings) * calib["calib_floor_sec"]
    norm_work = (
        round(max(work, 0.0) / calib["calib_md5_sec"], 3)
        if calib["calib_md5_sec"] > 0
        else None
    )
    full_line = json.dumps(
        {
            "metric": "battery_total_wall",
            "value": total,
            "unit": "sec",
            **calib,
            **calib_end,
            "normalized_total": normalized,
            "normalized_work": norm_work,
            "queries": timings,
            "queries_drift_corrected": corrected,
            "sf": sf_val,
        },
        separators=(",", ":"),
    )
    # The driver keeps only the LAST ~2000 chars of stdout and parses the
    # final line. With 100+ queries the full line is >4 KB, so it gets
    # front-truncated and the whole bench signal is lost (it was in rounds
    # 2 AND 3). Durably write the full detail next to the script, echo it
    # to stderr for log readers, and print to stdout ONLY a compact final
    # line guaranteed to survive the tail capture: total + the slowest
    # queries that fit, with the rest rolled up into an omitted-sum.
    (Path(__file__).parent / "BENCH.local.json").write_text(full_line + "\n")
    print(full_line, file=sys.stderr, flush=True)

    print(
        compact_bench_line(
            {
                "metric": "battery_total_wall",
                "value": total,
                "unit": "sec",
                **calib,
                **calib_end,
                "normalized_total": normalized,
                "normalized_work": norm_work,
                "sf": sf_val,
            },
            timings,
            corrected=corrected,
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
