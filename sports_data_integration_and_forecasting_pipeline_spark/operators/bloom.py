"""Bloom-filter semi-join pruning — ship a KB-sized bit array instead of
shuffling the big side of a selective join.

The classic 100 TB move: when `big ⋈ small_filtered` is selective, build
a Bloom filter over the small side's join keys (fixed ``n_bits`` bits —
kilobytes regardless of input size), broadcast it, and drop big-side
rows that cannot match BEFORE the shuffle. Spark's optimizer injects
this automatically in some shapes (`spark.sql.optimizer.runtime.
bloomFilter.enabled`); this module is the explicit, engine-portable
form: bit positions are md5-derived (`dedup.h32`), the bit array is a
`bit_or`-aggregated word table, so DuckDB reproduces the EXACT same
filter — including its false positives — and the battery entry
hash-matches the pruning statistics.

Plan shape:
- build: one narrow projection (k positions per key) + one tiny hash agg
  (≤ ``n_bits/64`` word rows) + a single-row map collapse. The words
  never exceed kilobytes, so `collect_list` into the 1-row map is safe
  at any input scale.
- probe: broadcast nested-loop join of the 1-row map (narrow), then a
  pure-Column k-way bit test. No shuffle touches the big side.

No reference counterpart; infrastructure for the skew/co-location
family in `operators/skew.py`.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h32


def _positions(key: Column, n_bits: int, k: int) -> Column:
    """Array of the key's k bit positions, staged once so downstream
    word/mask extraction doesn't re-run the hashing (Spark does not CSE
    repeated non-trivial sibling expressions).

    For k <= 4 all positions slice ONE md5 (disjoint 8-hex-digit spans —
    one hash per probe instead of k; measured 3x less hashing on the
    scan-bound probe side); beyond 4 the extra positions fall back to
    salted md5s."""
    md = F.md5(key.cast("string"))
    pos = [
        F.pmod(
            F.conv(F.substring(md, 1 + 8 * i, 8), 16, 10).cast("long"),
            F.lit(n_bits),
        )
        for i in range(min(k, 4))
    ]
    pos += [
        F.pmod(h32(F.concat(F.lit(f"{i}:"), key.cast("string"))), F.lit(n_bits))
        for i in range(4, k)
    ]
    return F.array(*pos)


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 4096, k: int = 3
) -> DataFrame:
    """1-row DataFrame ``(bloom: map<int,bigint>)``: word index → 63-bit
    word with every hashed key's bits OR'd in (bit 63 stays clear: DuckDB
    raises on signed ``1 << 63``, so words hold 63 usable bits in both
    engines). Kilobytes at any scale."""
    cells = (
        df.select(_positions(F.col(key_col), n_bits, k).alias("ps"))
        .select(F.explode("ps").alias("pos"))
        .select(
            F.expr("cast(pos div 63 as int)").alias("word"),
            # F.shiftleft takes a literal int count — SQL form for a column count
            F.expr("shiftleft(1L, cast(pos % 63 as int))").alias("mask"),
        )
    )
    words = cells.groupBy("word").agg(F.bit_or("mask").alias("bits"))
    return words.groupBy().agg(
        F.map_from_arrays(
            F.collect_list("word"), F.collect_list("bits")
        ).alias("bloom")
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = 4096,
    k: int = 3,
    out_col: str = "bloom_pass",
) -> DataFrame:
    """``df`` + boolean ``out_col``: False ⇒ key is definitely NOT in the
    set the bloom was built from; True ⇒ probably in (false-positive rate
    ~``(1 - e^(-k·n/n_bits))^k``). Narrow — broadcast 1-row join, no
    shuffle on ``df``."""
    # Reserved working columns: the 1-row bloom map is aliased before the
    # cross join so a probe df that itself has a `bloom` column survives;
    # collide on the reserved names and we raise instead of silently
    # dropping user data in the trailing drop().
    reserved = {"__bloom_words", "__ps"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"bloom_might_contain: probe DataFrame already has reserved "
            f"column(s) {sorted(clash)}; rename them before probing"
        )
    words = bloom.select(F.col("bloom").alias("__bloom_words"))
    probed = df.join(F.broadcast(words)).withColumn(
        "__ps", _positions(F.col(key_col), n_bits, k)
    )
    checks = [
        F.expr(
            f"(coalesce(element_at(__bloom_words, cast(element_at(__ps, {i + 1}) div 63 as int)), 0L)"
            f" & shiftleft(1L, cast(element_at(__ps, {i + 1}) % 63 as int))) != 0"
        )
        for i in range(k)
    ]
    return probed.withColumn(out_col, reduce(lambda a, b: a & b, checks)).drop(
        "__bloom_words", "__ps"
    )


def bloom_prune(
    big: DataFrame,
    key_col: str,
    small_keys: DataFrame,
    small_key_col: str | None = None,
    n_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Filter ``big`` to rows whose ``key_col`` might appear in
    ``small_keys`` — the pre-shuffle pruning step. Sound (never drops a
    true match); the surviving false positives are eliminated by the
    real join that follows."""
    bloom = bloom_build(
        small_keys.select(F.col(small_key_col or key_col).alias(key_col)),
        key_col,
        n_bits,
        k,
    )
    return (
        bloom_might_contain(big, key_col, bloom, n_bits, k)
        .filter(F.col("bloom_pass"))
        .drop("bloom_pass")
    )
