"""Self-consistency for the rows-only sketch entries (no cross-engine
oracle is possible: HLL register layouts and percentile summaries are
engine-specific by construction). The correctness signal is the error
bound instead: each sketch must track its exact, oracle-checked
counterpart within the sketch's published guarantee.
"""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import QUERIES

from .conftest import TESTDATA_SMOKE


def test_hll_verified_within_bound(spark):
    """The hash-oracled twin (replaced the rows-only hll_distinct_sketch,
    r10 review task 7): every group's within_bound must be TRUE — that is
    the boolean the external oracle pins, so this is the same invariant
    checked locally at smoke scale too."""
    rows = QUERIES["hll_distinct_verified"].fn(spark, TESTDATA_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["exact_ndv"] > 0
        assert r["within_bound"], (r["event_type"], r["exact_ndv"])


def test_approx_percentiles_verified_within_bound(spark):
    """The hash-oracled twin (replaced the rows-only
    approx_percentile_sketch): the GK rank guarantee must hold for every
    (group, percentile) at smoke scale; also sanity-check the raw
    percentile_approx value IS a data value (GK returns elements)."""
    import bisect
    from collections import defaultdict

    from pyspark.sql import functions as F

    rows = QUERIES["approx_percentile_verified"].fn(spark, TESTDATA_SMOKE).collect()
    assert rows and {r["pct"] for r in rows} == {50, 90, 99}
    for r in rows:
        assert r["within_bound"], (r["event_type"], r["pct"])

    ev = spark.read.parquet(f"{TESTDATA_SMOKE}/events.parquet")
    approx = {
        r["event_type"]: r["ps"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 1000).alias("ps"))
        .collect()
    }
    vals = defaultdict(list)
    for r in ev.select("event_type", "value").collect():
        vals[r["event_type"]].append(r["value"])
    assert set(approx) == set(vals) and approx
    for et, ps in approx.items():
        v = sorted(vals[et])
        for x in ps:
            lo = bisect.bisect_left(v, x)
            hi = bisect.bisect_right(v, x)
            assert lo < hi, (et, x, "approx value not a data value")


def test_sketches_are_deterministic(spark):
    """Same input, same plan -> identical sketch output (both sketches are
    deterministic algorithms; only cross-ENGINE values diverge)."""
    for name in ("hll_distinct_verified", "approx_percentile_verified"):
        a = sorted(map(tuple, QUERIES[name].fn(spark, TESTDATA_SMOKE).collect()))
        b = sorted(map(tuple, QUERIES[name].fn(spark, TESTDATA_SMOKE).collect()))
        assert a == b, name


def test_countmin_never_underestimates_and_exact_when_wide(spark):
    """CMS guarantees: est >= true count always; with width >> cardinality
    some row is almost surely collision-free per item, so est == exact."""
    from collections import Counter

    from sports_data_integration_and_forecasting_pipeline_spark.operators.frequency import (
        countmin_estimate,
        countmin_sketch,
    )
    from pyspark.sql import functions as F

    items = spark.read.parquet(f"{TESTDATA_SMOKE}/events.parquet").select(
        F.col("user_id").cast("string").alias("item")
    )
    exact = Counter(r["item"] for r in items.collect())

    # narrow sketch: collisions expected -> est >= exact for every item
    narrow = countmin_estimate(
        countmin_sketch(items, "item", depth=4, width=16),
        items.distinct(),
        "item",
        depth=4,
        width=16,
    ).collect()
    assert {r["item"] for r in narrow} == set(exact)
    assert all(r["est_cnt"] >= exact[r["item"]] for r in narrow)
    assert any(r["est_cnt"] > exact[r["item"]] for r in narrow)  # collisions real

    # wide sketch: 4 independent rows x 4096 buckets for ~150 items ->
    # P(all 4 rows collide for some item) is negligible -> exact recovery
    wide = countmin_estimate(
        countmin_sketch(items, "item", depth=4, width=4096),
        items.distinct(),
        "item",
        depth=4,
        width=4096,
    ).collect()
    assert all(r["est_cnt"] == exact[r["item"]] for r in wide)


def test_misra_gries_bounds(spark):
    """MG guarantees: est <= true; undercount <= N/(k+1); every item with
    freq > N/(k+1) survives the merged summary."""
    from collections import Counter

    from sports_data_integration_and_forecasting_pipeline_spark.operators.frequency import misra_gries

    ev = spark.read.parquet(f"{TESTDATA_SMOKE}/events.parquet")
    for col, k in (("event_type", 3), ("user_id", 20)):
        exact = Counter(str(r[col]) for r in ev.select(col).collect())
        n = sum(exact.values())
        out = {r["item"]: r["est_cnt"] for r in misra_gries(ev, col, k=k).collect()}
        assert 0 < len(out) <= k, (col, len(out))
        bound = n / (k + 1)
        for item, est in out.items():
            assert est <= exact[item], (col, item, "overestimate")
            assert exact[item] - est <= bound, (col, item, "bound violated")
        for item, true_cnt in exact.items():
            if true_cnt > bound:
                assert item in out, (col, item, "guaranteed heavy hitter lost")


def test_hll_per_group_error_bound(spark):
    """The portable md5-register HLL tracks exact NDV (observed ~1% at
    sf0.01's NDV≈150; the RAW estimator is only meaningful above ~m
    distinct values — at sf0.001's NDV=15 the documented small-range bias
    dominates, which is why the bound is checked at sf0.01) — and its
    register state is deterministic, which is what lets the battery
    hash-oracle it."""
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.frequency import hll_per_group

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    est = {
        r["event_type"]: r["est_e4"] / 1e4
        for r in hll_per_group(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["nd"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) / exact[k] < 0.20, (k, est[k], exact[k])
    # determinism: identical run -> identical registers
    a = sorted(map(tuple, hll_per_group(ev, "event_type", "user_id").collect()))
    b = sorted(map(tuple, hll_per_group(ev, "event_type", "user_id").collect()))
    assert a == b
