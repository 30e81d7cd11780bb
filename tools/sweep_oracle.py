"""One-off oracle sweep of named battery entries at an arbitrary SF —
the pre-rotation gate check (house rule since r5: every entry is swept
green vs the DuckDB oracle at sf0.01, the external gate's scale, BEFORE
it rotates into the 50-slot driver window).

Usage: python tools/sweep_oracle.py [sf_dir] name [name ...]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from sports_data_integration_and_forecasting_pipeline_spark.plans import QUERIES  # noqa: E402
from sports_data_integration_and_forecasting_pipeline_spark.session import get_spark  # noqa: E402
from tests.oracle import compare, duckdb_con  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    names = args or sorted(QUERIES)
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb_con(sf)
    bad = 0
    for name in names:
        spec = QUERIES[name]
        try:
            got = spec.fn(spark, sf)
            if spec.oracle is None:
                n = got.count()
                print(f"{name}: rows-only ({n} rows)")
                continue
            problems = compare(got, con.sql(spec.oracle).df())
            if problems:
                bad += 1
                print(f"{name}: FAIL {problems}")
            else:
                print(f"{name}: ok")
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
    con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
