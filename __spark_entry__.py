"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full correctness battery
(:mod:`sports_data_integration_and_forecasting_pipeline_spark.plans.battery`), one entry per
operator family from SURVEY.md §2.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).parent))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _prepare(spark: SparkSession) -> None:
    """Session settings the engine relies on, applied defensively in case
    the driver built the session without them."""
    for k, v in [
        # events.parquet time columns are timestamp[us] (TIMESTAMP_NTZ);
        # the legacy flag additionally keeps TIMESTAMP(NANOS) snapshots
        # loadable as nanos-since-epoch longs.
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: best-price + two-outcome arbitrage market report
    (the reference's ``detect_discrepancies`` pipeline shape, SURVEY §3.2)
    over the sf0.001 tables."""
    _prepare(spark)
    from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import QUERIES

    return QUERIES["flagship_market_report"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator battery from SURVEY.md §2."""
    from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for every SQL-expressible query."""
    from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import QUERIES

    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}
