"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every config choice is made for the
1000-executor / 100 TB target: AQE on (runtime partition coalescing, skew
join splitting), broadcast threshold sized for dimension tables, Arrow for
the few pandas-interchange points, UTC session time zone so timestamp
semantics are stable across clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "sports_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster ``master`` comes from the environment; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # local[N] runs driver AND all executor threads in ONE JVM whose
        # heap defaults to spark.driver.memory = 1g — a 32-thread battery
        # in 1 GB spends its time in GC and eventually fails broadcast
        # builds (observed: GCLocker retry warnings + "not enough memory
        # to build and broadcast" mid-battery). 8g measured BEST here:
        # big heaps are not free — ≥31g made a fixed 50M-row md5 pass
        # ~5-10× slower on this box (G1 geometry/page-touch costs), while
        # 8g was slightly faster than 1g AND removes the OOM. Only
        # effective for the process that LAUNCHES the JVM — a real
        # cluster's submit-time settings take precedence.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        # AQE: runtime shuffle-partition coalescing + skew-join splitting —
        # the main lever that keeps one plan valid from sf0.001 to 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Dimension tables (region/nation/bookmaker maps) stay broadcastable.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Nested-schema pruning so exploded JSON scans read only used fields.
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # Time columns arrive as parquet timestamp[us] (TIMESTAMP_NTZ in
        # Spark). Legacy TIMESTAMP(NANOS) files would be rejected by
        # default; reading them as nanos-since-epoch longs keeps older
        # snapshots loadable alongside the µs schema.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
