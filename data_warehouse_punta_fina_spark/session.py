"""SparkSession factory.

Scale posture: AQE on (runtime coalesce + skew-join), shuffle partitions
sized for the local test harness but overridable via env for a real
cluster, UTC timezone pinned so timestamp semantics match external oracles
(DuckDB is UTC-naive), Arrow enabled for the pandas-UDF paths.

On a 1000-executor cluster the only knobs that change are
``spark.sql.shuffle.partitions`` (≈2-3× total cores) and executor memory;
nothing in the engine hard-codes a partition count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "punta_fina_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession with scale-aware defaults."""
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{DEFAULT_CPUS}]")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # floor for AQE's post-shuffle coalescing (Spark default 1m).
        # Compute-dense small-byte stages (quantized-vector training
        # aggregates, token stats) are k·dims-row tables at ANY corpus
        # size, so the floor is a scale-independent knob — overridable to
        # probe the coalesce-vs-parallelism trade without code changes.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "1m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata parquet carries TIMESTAMP(NANOS) which Spark has no
        # native type for; read as long and convert in the reader layer
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
