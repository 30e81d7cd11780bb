"""PII redaction: per-category scrubbing and count semantics."""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.operators.redact import redact_pii

from .conftest import TESTDATA_SMOKE


def test_redact_each_category(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "ssn 123-45-6789 phone 415-555-0199 ip 10.0.0.1"),
            (3, "clean text with numbers 12345 and dots... v1.2 ok"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["text"]
    assert "bob" not in out[1]["text"]
    r2 = out[2]
    assert (r2["n_ssn"], r2["n_phone"], r2["n_ipv4"]) == (1, 1, 1)
    assert r2["text"] == "ssn <SSN> phone <PHONE> ip <IP>"
    r3 = out[3]
    assert (r3["n_email"], r3["n_ssn"], r3["n_phone"], r3["n_ipv4"]) == (0, 0, 0, 0)
    assert r3["text"] == "clean text with numbers 12345 and dots... v1.2 ok"


def test_redaction_battery_seeds_are_nontrivial(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.plans import QUERIES

    out = QUERIES["pii_redaction"].fn(spark, TESTDATA_SMOKE).toPandas()
    # every category fires on the seeded corpus
    for c in ("n_email", "n_ssn", "n_phone", "n_ipv4"):
        assert out[c].sum() > 0, c
    # redaction changes the text wherever anything matched
    assert (out[["n_email", "n_ssn", "n_phone", "n_ipv4"]].sum(axis=1) > 0).any()
