"""Local mirror of the driver's DuckDB-oracle compare (BASELINE.md t2):
row count + column set + order-insensitive value comparison. Used by
tests/test_battery_oracle.py so oracle drift is caught before the driver
runs CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # DuckDB grabs every core per connection by default; a sharded
    # above-gate sweep (several concurrent sweep_oracle processes, r15
    # sf1 protocol) oversubscribes the box 3x without this knob.
    threads = os.environ.get("SWEEP_DUCKDB_THREADS")
    if threads:
        con.sql(f"SET threads={int(threads)}")
    for t in TABLES:
        # driver testdata is one file per table; Spark-written replica
        # sets (tools/gen_sf1_replicas.py) are DIRECTORIES of part
        # files — glob those so the same views work at probe scales
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_bool_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif dt == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    got = spark_df.toPandas()
    if set(got.columns) != set(oracle_pdf.columns):
        problems.append(
            f"column mismatch: spark={sorted(got.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(got) != len(oracle_pdf):
        problems.append(f"row count: spark={len(got)} oracle={len(oracle_pdf)}")
        return problems
    a, b = _normalize(got), _normalize(oracle_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c].dtype):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            for i in range(len(av)):
                x, y = av[i], bv[i]
                both_nan = (isinstance(x, float) and math.isnan(x)) and (
                    isinstance(y, float) and math.isnan(y)
                )
                if not both_nan and x != y:
                    problems.append(
                        f"col {c} row {i}: spark={x!r} oracle={y!r} "
                        f"(diff={x - y!r})"
                    )
                    if len(problems) > 5:
                        return problems
        else:
            neq = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                    f"spark={a[c][i]!r} oracle={b[c][i]!r}"
                )
    return problems
