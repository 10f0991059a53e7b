"""SparkSession builder with scale-appropriate defaults.

Defaults target correctness tests on local[N] while remaining valid on a
real cluster: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow on (vectorized pandas-UDF transfer), modest shuffle
partitions for local mode (a cluster deployment overrides
spark.sql.shuffle.partitions or relies on AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "anser-spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, else all local cores.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # SimplifyCaseConversionExpressions rewrites lower(upper(x)) →
        # lower(x), which is UNSOUND for Unicode one-way case mappings
        # (upper('ß')='SS' → lower='ss', but lower('ß')='ß') — found by
        # the seeded expression fuzzer diverging from the Mongo-semantics
        # evaluator. Excluding the rule restores correct composition of
        # $toUpper/$toLower; the lost optimization is negligible.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "SimplifyCaseConversionExpressions",
        )
        .config("spark.ui.showConsoleProgress", "false")
        # UI off by default (driver-side listener/HTTP overhead);
        # profiling scripts flip it on for the REST job-attribution API
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") else "false",
        )
        # local mode = one JVM for driver+executors: size the heap for a
        # long session of heavy queries (8g measured sustained GC drag
        # over a ~50-query run on this 128 GiB box; cluster deployments
        # set executor memory explicitly and ignore this)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # local-fs writes don't need the v1 commit protocol's double
        # rename or _SUCCESS markers — mutation versions swap via the
        # engine's own atomic pointer
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    )
    return builder.getOrCreate()
