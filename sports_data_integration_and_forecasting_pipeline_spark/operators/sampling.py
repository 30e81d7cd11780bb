"""Deterministic, engine-reproducible sampling — the repeatable kind a
training-data pipeline needs (re-running a 100 TB curation job must pick
the SAME sample; ``df.sample`` is seed×partitioning dependent and not
reproducible across engines or re-partitions).

Key-hash Bernoulli: keep a row iff ``h60(key) / 2^60 < fraction``. The
decision is a pure function of the row's key — stable under re-partition,
re-ordering, engine choice (md5-derived, same as the dedup hash
discipline), and incremental reruns (a row's in/out never flips). A
narrow filter with no shuffle; Catalyst pushes it into the scan stage.

Stratified variant: per-stratum fractions via a tiny broadcast map —
bounds every stratum's sample rate independently (the standard fix for
skewed class balance in corpus curation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h60

_H60_SPACE = float(1 << 60)


def _key_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) from a key: md5-derived 60-bit hash
    scaled down. ``salt`` decorrelates independent samples over the same
    keys (e.g. train/validation splits)."""
    return h60(F.concat(F.lit(salt), key.cast("string"))) / F.lit(_H60_SPACE)


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by each row's key hash."""
    return df.filter(_key_uniform(F.col(key_col), salt) < fraction)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum → fraction, unlisted
    strata get ``default_fraction``. The fraction lookup is a literal
    map (broadcast by value inside the plan, no join)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )
    frac = F.coalesce(
        mapping[F.col(strata_col)], F.lit(float(default_fraction))
    )
    return df.filter(_key_uniform(F.col(key_col), salt) < frac)


def train_holdout_split(
    df: DataFrame,
    key_col: str,
    holdout_fraction: float = 0.1,
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic disjoint train/holdout split by key hash: the same
    key always lands on the same side, across reruns and engines — the
    leakage-proof split a forecasting backtest needs."""
    u = _key_uniform(F.col(key_col), salt)
    return df.filter(u >= holdout_fraction), df.filter(u < holdout_fraction)
