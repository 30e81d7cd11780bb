"""Dump ``df.explain("formatted")`` for named battery entries to
``plans/$SPARK_GRAFT_PLANS_ROUND/<entry>_<suffix>.txt`` (default r16) —
the optimization round's plan evidence files (judge-checkable without
running Spark).

Usage: python tools/dump_explain.py SUFFIX ENTRY [ENTRY ...] [--sf DIR]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names: list[str] = []
    suffix = args.pop(0)
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import QUERIES
    from sports_data_integration_and_forecasting_pipeline_spark.session import get_spark

    spark = get_spark(app_name="dump_explain", master="local[4]")
    out_dir = (
        Path(__file__).parent.parent
        / "plans"
        / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(
            f"# {name} — explain('formatted') at {sf_dir}\n\n{txt}"
        )
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
