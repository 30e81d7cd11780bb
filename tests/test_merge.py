"""MERGE INTO operator semantics (r7 new operator family): matched
update/delete, unmatched insert, ANSI ignore rules, and the fail-loud
preconditions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.merge import (
    MERGE_SOURCE_MAX_ROWS,
    merge_into,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, name string, amt long",
    )


def _source(spark, rows):
    return spark.createDataFrame(
        rows, "op string, k long, name string, amt long"
    )


def test_merge_all_clauses(spark):
    src = _source(
        spark,
        [
            ("update", 1, "a2", 11),   # matched -> replaced
            ("delete", 2, None, None), # matched -> dropped
            ("insert", 9, "z", 90),    # unmatched -> appended
        ],
    )
    out = {
        r["k"]: (r["name"], r["amt"], r["merge_action"])
        for r in merge_into(_target(spark), src, ["k"]).collect()
    }
    assert out == {
        1: ("a2", 11, "update"),
        3: ("c", 30, "carry"),
        9: ("z", 90, "insert"),
    }


def test_merge_ansi_ignore_rules(spark):
    """Matched insert is ignored (row carries); unmatched update/delete
    are ignored (no phantom rows)."""
    src = _source(
        spark,
        [
            ("insert", 1, "dup", 99),   # matched insert -> ignored
            ("update", 7, "x", 70),     # unmatched update -> ignored
            ("delete", 8, None, None),  # unmatched delete -> ignored
        ],
    )
    out = {
        r["k"]: r["merge_action"]
        for r in merge_into(_target(spark), src, ["k"]).collect()
    }
    assert out == {1: "carry", 2: "carry", 3: "carry"}


def test_merge_duplicate_source_key_raises(spark):
    src = _source(
        spark,
        [("update", 1, "a2", 11), ("delete", 1, None, None)],
    )
    with pytest.raises(AssertionError, match="source-key precondition"):
        merge_into(_target(spark), src, ["k"])


def test_merge_oversized_source_raises(spark):
    big = spark.range(MERGE_SOURCE_MAX_ROWS + 1).select(
        F.lit("update").alias("op"),
        F.col("id").alias("k"),
        F.lit("x").alias("name"),
        F.lit(0).cast("long").alias("amt"),
    )
    with pytest.raises(AssertionError, match="source-size precondition"):
        merge_into(_target(spark), big, ["k"])


def test_merge_target_never_shuffled(spark):
    """The scale contract: with a change-batch source, the merged plan
    contains broadcast joins only — no exchange of the target side
    (shuffle exchanges would mean the 100 TB table moves)."""
    src = _source(spark, [("update", 1, "a2", 11), ("insert", 9, "z", 90)])
    plan = merge_into(_target(spark), src, ["k"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # every join in the plan is broadcast (no SortMergeJoin / shuffled hash)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_merge_property_matches_reference_model(spark):
    """Property check against a plain-Python MERGE model: random keyed
    targets and change batches (unique source keys) must merge to
    exactly the model's dict-based result — hypothesis-style coverage
    of clause interactions without per-example Spark jobs (one seeded
    sweep, 8 deterministic scenarios)."""
    import random

    rng = random.Random(42)
    for trial in range(8):
        t_keys = rng.sample(range(1, 40), rng.randint(3, 12))
        target_rows = [(k, f"n{k}", k * 10) for k in t_keys]
        src_keys = rng.sample(range(1, 60), rng.randint(1, 15))
        src_rows = [
            (rng.choice(["update", "delete", "insert"]), k, f"s{k}", k * 100)
            for k in src_keys
        ]
        # reference model
        state = {k: (n, a, "carry") for (k, n, a) in target_rows}
        for op, k, n, a in src_rows:
            if op == "update" and k in state:
                state[k] = (n, a, "update")
            elif op == "delete" and k in state:
                del state[k]
            elif op == "insert" and k not in {x[0] for x in target_rows}:
                state[k] = (n, a, "insert")
        tgt = spark.createDataFrame(
            target_rows, "k long, name string, amt long"
        )
        src = _source(spark, src_rows)
        for bc in (True, False):  # broadcast AND co-partitioned plans
            got = {
                r["k"]: (r["name"], r["amt"], r["merge_action"])
                for r in merge_into(
                    tgt, src, ["k"], broadcast_source=bc
                ).collect()
            }
            assert got == state, f"trial {trial} bc={bc}: {got} != {state}"


def test_ivf_refresh_idle_cells_unchanged(spark):
    """Windowed ANN refresh: a cell with no arriving vectors must
    refresh to exactly its old components ((W*c) DIV W = c), and the
    output is always the full |cells| x dim state."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.ivf_centroids import (
        IVF_CENTROIDS,
    )
    from sports_data_integration_and_forecasting_pipeline_spark.operators.similarity import (
        ivf_centroid_refresh,
        np_floor_e6,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = ivf_centroid_refresh(
        emb, IVF_CENTROIDS, F.col("vec_id") < 0  # empty window
    ).collect()
    assert len(out) == len(IVF_CENTROIDS) * len(IVF_CENTROIDS[0])
    for r in out:
        assert r["n_new"] == 0
        expect = np_floor_e6(IVF_CENTROIDS[r["cell"]][r["pos"] - 1])
        assert r["refreshed_e6"] == expect


def test_merge_reserved_column_collision_raises(spark):
    """r8 ADVICE guard: a target/source column colliding with the plan's
    reserved internals (__op, __t, __src_<col>) or the action output
    must fail loudly at entry, not mid-plan with an ambiguous-column
    error or silent wrong payload substitution."""
    tgt_bad = _target(spark).withColumn("__t", F.lit(1))
    src = _source(spark, [("update", 1, "a2", 11)])
    with pytest.raises(ValueError, match="reserved-name collision"):
        merge_into(tgt_bad, src, ["k"])
    # action_col colliding with an existing payload column
    with pytest.raises(ValueError, match="reserved-name collision"):
        merge_into(_target(spark), src, ["k"], action_col="amt")
    # source carrying a __src_-prefixed column
    src_bad = src.withColumn("__src_amt", F.lit(0))
    with pytest.raises(ValueError, match="reserved-name collision"):
        merge_into(_target(spark), src_bad, ["k"])
