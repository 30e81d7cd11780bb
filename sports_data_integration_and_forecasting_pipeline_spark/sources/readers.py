"""File / in-memory readers producing schema-pinned DataFrames (S3-S4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import GAME_SCHEMA


def read_odds_json(spark: SparkSession, path: str) -> DataFrame:
    """S3: read a TheOddsAPI-style JSON file (array of games) into one row
    per game with the declared nested schema (reference ``web/app.py:14-19``
    loads the same fixture with ``json.load``)."""
    return (
        spark.read.schema(GAME_SCHEMA)
        .option("multiLine", "true")
        .json(path)
    )


def games_from_json_strings(spark: SparkSession, payload: str) -> DataFrame:
    """Parse an in-memory API response (JSON array string) into game rows —
    the bridge from the driver-side fetch layer into Spark. Uses
    ``from_json`` + ``explode`` so the same explicit schema governs both
    file and live paths."""
    from ..schemas import ODDS_API_SCHEMA

    raw = spark.createDataFrame([(payload,)], ["json"])
    return raw.select(
        F.explode(F.from_json("json", ODDS_API_SCHEMA)).alias("game")
    ).select("game.*")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided parquet table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
