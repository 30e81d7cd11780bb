"""Rolling-window player features + forecast target (SURVEY §2.5 W1-W2).

pandas ``rolling(5, min_periods=1).mean()`` (reference
``src/features.py:8-18``) maps exactly to a Spark row-frame window
``rowsBetween(-4, 0)`` — ``avg`` over a short frame natively averages
however many rows exist, matching ``min_periods=1``. ``shift(-1)`` maps to
``lead(..., 1)`` with trailing-null drop (``features.py:21-23``).

Scale note: one shuffle on ``player``; both windows and the lead share the
same (partition, order) spec so Spark sorts once. For 100 TB of game logs,
pre-partitioning the log table by player (bucketing) removes the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROLLING_GAMES = 5  # reference src/features.py:11


def build_features(
    df: DataFrame,
    stat_cols: tuple[str, ...] = ("points", "rebounds", "assists"),
    target_col: str = "points",
    drop_na_target: bool = True,
) -> DataFrame:
    """Add ``{stat}_rolling_avg`` per stat and ``target_{target_col}`` =
    next game's value, dropping each player's final game
    (reference ``src/features.py:3-23``). Pass ``drop_na_target=False``
    for scoring-time feature builds, where the null-target trailing row
    is exactly the one to predict."""
    order = Window.partitionBy("player").orderBy(F.asc("date"))
    frame = order.rowsBetween(-(ROLLING_GAMES - 1), 0)
    out = df
    for c in stat_cols:
        out = out.withColumn(f"{c}_rolling_avg", F.avg(c).over(frame))
    out = out.withColumn(f"target_{target_col}", F.lead(target_col, 1).over(order))
    if drop_na_target:
        out = out.na.drop(subset=[f"target_{target_col}"])
    return out
