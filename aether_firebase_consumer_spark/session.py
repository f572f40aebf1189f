"""SparkSession factory.

Local-mode settings are tuned for the test harness (local[N] single JVM);
cluster posture is expressed through the same knobs (AQE, shuffle
partitions, Arrow) which scale to multi-executor deployments unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "aether_firebase_consumer_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    - AQE on: runtime coalescing + skew-join handling — the 100 TB posture
      (skewed keys re-split at runtime, tiny shuffle partitions merged).
    - shuffle.partitions sized to local cores (driver env
      ``SPARK_GRAFT_CPUS``, default 32); on a real cluster this would be
      ~2-3x total executor cores, with AQE coalescing the tail.
    - UTC session timezone so timestamp semantics match the DuckDB oracle.
    - Arrow enabled: vectorized pandas-UDF exchange for the few operators
      that need Python (multimodal decode, canonical-JSON hash).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # fixture events.parquet carries TIMESTAMP(NANOS); read as long ns
        # (converted to TimestampType in tables.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write timestamps as TIMESTAMP_MICROS, not legacy INT96:
        # INT96 carries NO footer min/max statistics, which would
        # blind both row-group pruning and the stats-manifest file
        # skipping (sinks/stats.py) on every timestamp column
        .config("spark.sql.parquet.outputTimestampType",
                "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
