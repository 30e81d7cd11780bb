"""fk_orphan_audit: hand-built parent/child with dangling and null FKs."""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.operators.integrity import fk_orphan_audit


def test_orphans_nulls_and_clean_relationship(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, 99), (5, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    got = {r["fk_name"]: r for r in fk_orphan_audit(
        [
            ("child->parent", child, "fk", parent, "pk"),
            ("parent->parent", parent, "pk", parent, "pk"),
        ]
    ).collect()}
    bad = got["child->parent"]
    # rows 3,4 dangle on key 99; row 5 has a null FK -> 3 orphan rows,
    # but only ONE orphan key (99; null is not a key)
    assert bad["n_child_rows"] == 5
    assert bad["n_orphan_rows"] == 3
    assert bad["n_orphan_keys"] == 1
    clean = got["parent->parent"]
    assert clean["n_orphan_rows"] == 0 and clean["n_orphan_keys"] == 0
