"""Cross-engine parity of the battery's arithmetic helpers on the edge
cases the oracles never exercise with current testdata — so a driver
testdata regeneration (e.g. pre-1970 timestamps) can't silently flip
semantics. Round-5 regression: a pmod-based floor _fdiv was briefly
shipped on the claim that DuckDB's integer `//` floors; it TRUNCATES
toward zero (verified here against the pinned DuckDB), so _fdiv must
truncate too."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import _fdiv


def test_fdiv_matches_duckdb_integer_division_on_negatives(spark):
    cases = [(-500_000, 1_000_000), (-500_000, 86_400_000_000),
             (500_000, 1_000_000), (-7, 3), (7, 3), (-6, 3)]
    got = {
        (c, n): spark.range(1)
        .select(_fdiv(F.lit(c).cast("long"), n).alias("d"))
        .collect()[0]["d"]
        for c, n in cases
    }
    con = duckdb.connect()
    for (c, n), spark_val in got.items():
        duck_val = con.sql(
            f"SELECT CAST({c} AS BIGINT) // CAST({n} AS BIGINT)"
        ).fetchone()[0]
        assert spark_val == duck_val, ((c, n), spark_val, duck_val)
    con.close()
