from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).parents[1]
sys.path.insert(0, str(REPO_ROOT))

FIXTURES = Path(__file__).parent / "fixtures"
SAMPLE_ODDS_JSON = FIXTURES / "sample_odds.json"
TESTDATA_SMOKE = "/root/testdata/sf0.001"
TESTDATA_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from sports_data_integration_and_forecasting_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark


@pytest.fixture(scope="session")
def sample_games(spark):
    """The golden odds fixture as a games DataFrame (one row per game)."""
    from sports_data_integration_and_forecasting_pipeline_spark.sources.readers import (
        read_odds_json,
    )

    return read_odds_json(spark, str(SAMPLE_ODDS_JSON)).cache()
