"""Rolling features vs an in-test pandas re-computation — bit-for-bit
parity with ``rolling(5, min_periods=1).mean()`` + ``shift(-1)``
(reference ``src/features.py:3-23``)."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from sports_data_integration_and_forecasting_pipeline_spark.operators.features import (
    build_features,
)


def _game_logs(n_players=4, n_games=9, seed=7):
    rng = random.Random(seed)
    rows = []
    for p in range(n_players):
        for g in range(n_games):
            rows.append(
                (
                    f"player_{p}",
                    dt.date(2025, 1, 1) + dt.timedelta(days=g),
                    float(rng.randint(0, 40)),
                    float(rng.randint(0, 15)),
                    float(rng.randint(0, 12)),
                )
            )
    return rows


def test_build_features_matches_pandas(spark):
    rows = _game_logs()
    df = spark.createDataFrame(
        rows, "player string, date date, points double, rebounds double, assists double"
    )
    got = (
        build_features(df)
        .orderBy("player", "date")
        .toPandas()
        .reset_index(drop=True)
    )

    pdf = pd.DataFrame(
        rows, columns=["player", "date", "points", "rebounds", "assists"]
    ).sort_values(["player", "date"])
    for c in ("points", "rebounds", "assists"):
        pdf[f"{c}_rolling_avg"] = pdf.groupby("player")[c].transform(
            lambda x: x.rolling(5, min_periods=1).mean()
        )
    pdf["target_points"] = pdf.groupby("player")["points"].shift(-1)
    pdf = pdf.dropna(subset=["target_points"]).reset_index(drop=True)

    assert len(got) == len(pdf)  # each player's last game dropped
    for c in [
        "points_rolling_avg",
        "rebounds_rolling_avg",
        "assists_rolling_avg",
        "target_points",
    ]:
        assert got[c].tolist() == pytest.approx(pdf[c].tolist())


def test_ewma_by_key_hand_computed(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.features import ewma_by_key

    rows = [
        (1, 1, 8.0), (1, 2, 4.0), (1, 3, 0.0),  # s: 8 -> 5 -> 3.75
        (2, 1, 7.5),                             # single event: s = x
    ]
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    got = {r["user_id"]: r for r in
           ewma_by_key(df, "user_id", ["seq"], "value").collect()}
    assert got[1]["n_events"] == 3
    assert got[1]["ewma_last"] == 0.25 * 0.0 + 0.75 * (0.25 * 4.0 + 0.75 * 8.0)
    assert got[2]["ewma_last"] == 7.5 and got[2]["n_events"] == 1


def test_ewma_order_pinning_matters(spark):
    """Same rows, shuffled input partitioning: the pinned order_cols make
    the sequential result identical."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.features import ewma_by_key

    rows = [(1, i, float((i * 37) % 11)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    a = ewma_by_key(df, "user_id", ["seq"], "value").collect()[0]["ewma_last"]
    b = ewma_by_key(df.repartition(13), "user_id", ["seq"], "value").collect()[0]["ewma_last"]
    assert a == b
