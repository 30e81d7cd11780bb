"""One-off oracle sweep of named battery entries at an arbitrary SF —
the pre-rotation gate check (house rule since r5: every entry is swept
green vs the DuckDB oracle at sf0.01, the external gate's scale, BEFORE
it rotates into the 50-slot driver window).

Usage: python tools/sweep_oracle.py [sf_dir] name [name ...]

Env knobs (r15, for the above-gate-scale sf1 sweep — VERDICT r14
task 1): SWEEP_CPUS (local[N] threads, default 8), SWEEP_SHUFFLE
(shuffle partitions, default 16), SWEEP_TIME=1 (append per-entry
wall seconds, Spark-side and oracle-side, to each line).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from sports_data_integration_and_forecasting_pipeline_spark.plans import QUERIES  # noqa: E402
from sports_data_integration_and_forecasting_pipeline_spark.session import get_spark  # noqa: E402
from tests.oracle import compare, duckdb_con  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    names = args or sorted(QUERIES)
    cpus = int(os.environ.get("SWEEP_CPUS", "8"))
    shuffle = int(os.environ.get("SWEEP_SHUFFLE", "16"))
    timed = os.environ.get("SWEEP_TIME") == "1"
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=shuffle)
    con = duckdb_con(sf)
    bad = 0
    for name in names:
        spec = QUERIES[name]
        try:
            t0 = time.monotonic()
            got = spec.fn(spark, sf)
            if spec.oracle is None:
                n = got.count()
                suffix = f"  [{time.monotonic() - t0:.1f}s]" if timed else ""
                print(f"{name}: rows-only ({n} rows){suffix}", flush=True)
                continue
            got_pdf_t0 = time.monotonic()
            oracle_pdf = con.sql(spec.oracle).df()
            t_oracle = time.monotonic() - got_pdf_t0
            problems = compare(got, oracle_pdf)
            t_all = time.monotonic() - t0
            suffix = (
                f"  [{t_all:.1f}s total, {t_oracle:.1f}s oracle]"
                if timed
                else ""
            )
            if problems:
                bad += 1
                print(f"{name}: FAIL {problems}{suffix}", flush=True)
            else:
                print(f"{name}: ok{suffix}", flush=True)
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(
                f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}",
                flush=True,
            )
    con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
