"""table_diff: snapshot diffing on hand-built frames — all four statuses,
positional null safety of the row fingerprint, delta-only default."""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.operators.diff import table_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b string")


def test_all_four_statuses(spark):
    old = _snap(spark, [(1, "x", "y"), (2, "x", "y"), (3, "x", "y")])
    new = _snap(spark, [(1, "x", "y"), (2, "x", "Z"), (4, "n", "n")])
    got = {r["k"]: r["status"] for r in
           table_diff(old, new, ["k"], ["a", "b"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}
    full = {r["k"]: r["status"] for r in
            table_diff(old, new, ["k"], ["a", "b"],
                       include_unchanged=True).collect()}
    assert full[1] == "unchanged" and len(full) == 4


def test_fingerprint_is_positionally_null_safe(spark):
    # ("a", NULL) must NOT collide with (NULL, "a") or ("a",) semantics —
    # a naive concat_ws would skip the null and merge them.
    old = _snap(spark, [(1, "a", None)])
    new = _snap(spark, [(1, None, "a")])
    got = table_diff(old, new, ["k"], ["a", "b"]).collect()
    assert len(got) == 1 and got[0]["status"] == "changed"
