"""Round-7 regression tests for the r6 ADVICE fixes: cube/rollup
empty-input grand-total row, Markov sink-state retention."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import (
    cube_pricing,
    markov_steady_state_power,
    rollup_pricing,
)

from .conftest import TESTDATA_SMOKE


def test_rollup_cube_empty_input_divergence_pinned(spark, tmp_path):
    """r6 ADVICE follow-up, pinning the ACTUAL engine semantics: over
    an empty fact table ANSI/DuckDB's ROLLUP emits the () grand-total
    row (count 0), while Spark — in the RAW SQL form too, so this is a
    Spark-vs-ANSI divergence and not an artifact of the pre-aggregate
    rewrite — emits zero rows. The rewritten entries must match
    Spark's own raw-form behavior (empty result), and the divergence
    is documented next to the entries."""
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path)
    # single-file empty parquet (pyarrow): Spark's writer emits no part
    # files for an empty frame, which DuckDB's glob cannot open
    src = pq.read_table(f"{TESTDATA_SMOKE}/lineitem.parquet")
    pq.write_table(src.slice(0, 0), f"{sf_dir}/lineitem.parquet")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW lineitem AS "
        f"SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    oracle = con.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """
    ).df()
    # DuckDB: the ANSI grand-total row, with count 0 (never NULL)
    assert len(oracle) == 1 and oracle["n_rows"][0] == 0
    # Spark raw form: zero rows — the baseline the rewrite must match
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    raw = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"))
        .collect()
    )
    assert raw == []
    for fn in (rollup_pricing, cube_pricing):
        assert fn(spark, sf_dir).collect() == [], fn.__name__
    con.close()


def test_global_row_number_matches_global_window(spark):
    """r7: the distributed two-phase global rank must agree rank-for-rank
    with the partition-less window form, ascending and descending,
    including when the range partitioner's sampled boundaries split
    value ties across partitions (unique tiebreak column pins them)."""
    from pyspark.sql import Window

    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        release_caches,
    )
    from sports_data_integration_and_forecasting_pipeline_spark.operators.parallelism import (
        global_row_number,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 137).alias("v"),  # heavy ties
        F.col("id").alias("k"),
    )
    naive_asc = df.select(
        "k", F.row_number().over(Window.orderBy("v", "k")).alias("i")
    )
    dist_asc = global_row_number(
        df, ["v", "k"], rank_col="i", cache_role="test_rank_asc"
    ).select("k", "i")
    assert sorted(map(tuple, dist_asc.collect())) == sorted(
        map(tuple, naive_asc.collect())
    )
    naive_desc = df.select(
        "k",
        F.row_number()
        .over(Window.orderBy(F.col("v").desc(), "k"))
        .alias("i"),
    )
    dist_desc = global_row_number(
        df,
        [F.col("v").desc(), F.col("k")],
        rank_col="i",
        cache_role="test_rank_desc",
    ).select("k", "i")
    assert sorted(map(tuple, dist_desc.collect())) == sorted(
        map(tuple, naive_desc.collect())
    )
    release_caches()


def test_markov_sink_state_retains_mass(spark, tmp_path):
    """r6 ADVICE: an event type appearing only as a transition TARGET
    is a sink state; it must be in the state universe with an e9
    self-loop so mass routed into it is retained (total mass conserved
    up to floor loss), not silently dropped at the next multiply."""
    # one user, chain a -> b -> end: 'end' never appears as a source
    rows = [
        (1, 1, "a", 1_700_000_000),
        (1, 2, "b", 1_700_000_060),
        (1, 3, "end", 1_700_000_120),
    ]
    ev = spark.createDataFrame(
        [
            (u, e, t, ts)
            for (u, e, t, ts) in rows
        ],
        "user_id long, event_id long, event_type string, epoch_s long",
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.timestamp_micros(F.col("epoch_s") * 1_000_000).alias("ts"),
        F.lit(1.0).alias("value"),
        F.lit("web").alias("source"),
    )
    sf_dir = str(tmp_path)
    ev.write.parquet(f"{sf_dir}/events.parquet")
    out = {
        r["state"]: r["mass_e9"]
        for r in markov_steady_state_power(spark, sf_dir).collect()
    }
    # sink state present and holding mass (it is absorbing: after 3
    # rounds everything that started anywhere has flowed into 'end')
    assert "end" in out and out["end"] > 0
    # total mass conserved up to floor loss: uniform start floor-loses
    # ≤ |states| e9-units, each of 3 rounds ≤ |transition rows| more
    total = sum(out.values())
    assert 1_000_000_000 - total <= 4 * 3 + 3
    assert total <= 1_000_000_000
    # deterministic chain: all surviving mass is in the absorbing state
    assert out["end"] == total


def test_global_ntile_matches_native_window(spark):
    """r7: the distributed exact NTILE must agree bucket-for-bucket with
    the native partition-less window form, covering both remainder
    shapes (n % k == 0 and != 0) and the n < k corner where every
    bucket has at most one row."""
    from pyspark.sql import Window

    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        release_caches,
    )
    from sports_data_integration_and_forecasting_pipeline_spark.operators.parallelism import (
        global_ntile,
    )

    for n, k in [(10_000, 5), (9_998, 7), (3, 5)]:
        df = spark.range(n).select(
            (F.col("id") % 137).alias("v"),  # heavy ties
            F.col("id").alias("key"),
        )
        naive = df.select(
            "key",
            F.ntile(k)
            .over(Window.orderBy(F.col("v").desc(), "key"))
            .alias("b"),
        )
        dist = global_ntile(
            df,
            [F.col("v").desc(), F.col("key")],
            k=k,
            out_col="b",
            cache_role=f"test_ntile_{n}_{k}",
        ).select("key", "b")
        assert sorted(map(tuple, dist.collect())) == sorted(
            map(tuple, naive.collect())
        ), (n, k)
    release_caches()


def test_global_running_sum_matches_native_window(spark):
    """r7: the distributed two-phase running sum must agree row-for-row
    with the native partition-less ROWS UNBOUNDED PRECEDING window,
    ascending and descending, with value ties pinned by a unique
    tiebreak — including negative values (offsets must be true signed
    prefix sums, not counts-scaled)."""
    from pyspark.sql import Window

    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        release_caches,
    )
    from sports_data_integration_and_forecasting_pipeline_spark.operators.parallelism import (
        global_running_sum,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 211).alias("v"),  # heavy ties
        F.col("id").alias("key"),
        (F.col("id") % 13 - 6).cast("long").alias("x"),  # signed values
    )
    for order in (
        ["v", "key"],
        [F.col("v").desc(), F.col("key")],
    ):
        cols = [F.col(c) if isinstance(c, str) else c for c in order]
        naive = df.select(
            "key",
            F.sum("x")
            .over(
                Window.orderBy(*cols).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("c"),
        )
        dist = global_running_sum(
            df,
            order,
            "x",
            out_col="c",
            cache_role="test_cumsum",
        ).select("key", "c")
        assert sorted(map(tuple, dist.collect())) == sorted(
            map(tuple, naive.collect())
        )
        release_caches()


def test_pareto_frontier_matches_brute_force_dominance(spark):
    """r7 skyline: the prefix-min reduction must produce EXACTLY the
    NOT-EXISTS dominance set — exercised on a random cloud with heavy
    x/y ties plus pinned corners: exact-duplicate points (neither
    dominates; both survive) and a strictly-dominated straggler."""
    import pyspark.sql.functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        release_caches,
    )
    from sports_data_integration_and_forecasting_pipeline_spark.operators.parallelism import (
        pareto_frontier_2d,
    )

    # deterministic pseudo-random cloud with collisions in both coords
    pts = spark.range(2_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 101).alias("x"),
        (F.col("id") * 61 % 97).alias("y"),
    )
    # pinned corners: duplicate pair at (0, 0) — dominates everything
    # else, survives as a pair — and a straggler strictly above it
    extra = spark.createDataFrame(
        [(9001, 0, 0), (9002, 0, 0), (9003, 0, 1)], ["k", "x", "y"]
    )
    pts = pts.unionByName(extra)
    got = sorted(
        r["k"] for r in pareto_frontier_2d(pts, "x", "y").collect()
    )
    rows = pts.collect()
    brute = sorted(
        q["k"]
        for q in rows
        if not any(
            p["x"] <= q["x"]
            and p["y"] <= q["y"]
            and (p["x"] < q["x"] or p["y"] < q["y"])
            for p in rows
        )
    )
    assert got == brute
    assert 9001 in got and 9002 in got and 9003 not in got
    release_caches()


def test_pareto_frontier_kd_matches_brute_force_dominance(spark):
    """r7 k-D skyline: the divide-and-conquer local-skyline reduction
    must produce EXACTLY the 3-way NOT-EXISTS dominance set, on a tied
    random cloud plus pinned corners (duplicate minimum pair survives
    together; a point dominated only via the third dim is dropped)."""
    import pyspark.sql.functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.parallelism import (
        pareto_frontier_kd,
    )

    pts = spark.range(2_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 53).alias("x"),
        (F.col("id") * 61 % 47).alias("y"),
        (F.col("id") * 23 % 59).alias("z"),
    )
    extra = spark.createDataFrame(
        [
            (9001, 0, 0, 0),
            (9002, 0, 0, 0),  # duplicate global minimum: both survive
            (9003, 0, 0, 1),  # dominated ONLY via z
        ],
        ["k", "x", "y", "z"],
    )
    pts = pts.unionByName(extra)
    got = sorted(
        r["k"] for r in pareto_frontier_kd(pts, ["x", "y", "z"]).collect()
    )
    rows = pts.collect()
    brute = sorted(
        q["k"]
        for q in rows
        if not any(
            p["x"] <= q["x"]
            and p["y"] <= q["y"]
            and p["z"] <= q["z"]
            and (p["x"] < q["x"] or p["y"] < q["y"] or p["z"] < q["z"])
            for p in rows
        )
    )
    assert got == brute
    assert 9001 in got and 9002 in got and 9003 not in got


def test_pareto_frontier_kd_single_partition_input(spark):
    """r16 guard (ADVICE r15): a pathological single-partition input must
    still produce the exact skyline, and the default must spread the
    local pass instead of concentrating the whole O(n·m) walk plus a
    full pandas concat in one task (the guard repartitions to
    defaultParallelism when the input has exactly one partition)."""
    import pyspark.sql.functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.parallelism import (
        pareto_frontier_kd,
    )

    pts = (
        spark.range(1_000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 37 % 53).alias("x"),
            (F.col("id") * 61 % 47).alias("y"),
        )
        .repartition(1)
    )
    got = sorted(r["k"] for r in pareto_frontier_kd(pts, ["x", "y"]).collect())
    rows = pts.collect()
    brute = sorted(
        q["k"]
        for q in rows
        if not any(
            p["x"] <= q["x"]
            and p["y"] <= q["y"]
            and (p["x"] < q["x"] or p["y"] < q["y"])
            for p in rows
        )
    )
    assert got == brute


def test_exclusive_prefix_offsets_contract(spark):
    """r7: the shared offsets helper (four call sites: global rank,
    running sum, skyline prefix-min, SNM fix-up) must produce the
    exclusive prefix per __pid under each (part_agg, combine, zero)
    parameterization — first partition gets `zero` (or NULL when zero
    is None, the min-callers' convention)."""
    import pyspark.sql.functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.parallelism import (
        exclusive_prefix_offsets,
    )

    stamped = spark.createDataFrame(
        [(0, 5), (0, 1), (1, 7), (2, 2), (2, 3)], ["__pid", "v"]
    )
    counts = {
        r["__pid"]: r["__off"]
        for r in exclusive_prefix_offsets(
            stamped, F.count("*"), F.sum, zero=0, cast="long"
        ).collect()
    }
    assert counts == {0: 0, 1: 2, 2: 3}
    sums = {
        r["__pid"]: r["__soff"]
        for r in exclusive_prefix_offsets(
            stamped, F.sum("v"), F.sum, zero=0, out_col="__soff"
        ).collect()
    }
    assert sums == {0: 0, 1: 6, 2: 13}
    mins = {
        r["__pid"]: r["__moff"]
        for r in exclusive_prefix_offsets(
            stamped, F.min("v"), F.min, out_col="__moff"
        ).collect()
    }
    assert mins == {0: None, 1: 1, 2: 1}


def test_frontier_2d_and_kd_agree_on_two_dims(spark):
    """r7: the two skyline code paths — JVM prefix-min reduction and
    the Arrow divide-and-conquer — implement the same dominance
    semantics, so on a 2-column input they must return the same set."""
    import pyspark.sql.functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.dedup import (
        release_caches,
    )
    from sports_data_integration_and_forecasting_pipeline_spark.operators.parallelism import (
        pareto_frontier_2d,
        pareto_frontier_kd,
    )

    pts = spark.range(3_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 101).alias("x"),
        (F.col("id") * 61 % 97).alias("y"),
    )
    a = sorted(r["k"] for r in pareto_frontier_2d(pts, "x", "y").collect())
    b = sorted(
        r["k"] for r in pareto_frontier_kd(pts, ["x", "y"]).collect()
    )
    assert a == b and a
    release_caches()


def test_frontier_2d_rejects_null_metrics(spark):
    """r8 ADVICE guard: NULL x keys used to vanish silently at the
    annotation equi-join; the frontier now enforces the non-null
    precondition its kD sibling documents."""
    import pyspark.sql.functions as F
    import pytest

    from sports_data_integration_and_forecasting_pipeline_spark.operators.parallelism import (
        pareto_frontier_2d,
    )

    pts = spark.range(10).select(
        F.col("id").alias("k"),
        F.when(F.col("id") == 3, F.lit(None)).otherwise(F.col("id")).alias("x"),
        (F.col("id") % 4).alias("y"),
    )
    with pytest.raises(ValueError, match="NULL x/y"):
        pareto_frontier_2d(pts, "x", "y")
