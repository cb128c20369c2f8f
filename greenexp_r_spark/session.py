"""Tuned SparkSession builder.

Scale posture (SURVEY.md §4.3): AQE on (skew-join splitting as the
backstop behind our explicit salting), Arrow batches large enough to
amortize the Python boundary, shuffle partitions sized for the test
box but overridable for the bench's two-parallelism scaling runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "greenexp", master: str | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get(
        "GREENEXP_SHUFFLE_PARTITIONS", str(max(8, int(cpus) if cpus.isdigit() else 32))))
    return (
        SparkSession.builder.appName(app).master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # int64 micros (not legacy INT96) so parquet files carry
        # min/max statistics for timestamp columns — the icetable
        # manifest pruning and any engine's row-group skipping need them
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("GREENEXP_DRIVER_MEM", "8g"))
        # throughput GC: this is a batch-analytics JVM; G1's many
        # concurrent threads showed pathological kernel time on the
        # virtualized 32-vCPU test box
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
