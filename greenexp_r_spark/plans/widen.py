"""Scan-parallelism floor for single-row-group inputs.

The driver's test tables are written as ONE parquet row group per
file, so a scan cannot be split below file granularity no matter what
`spark.sql.files.maxPartitionBytes` says — at sf1.0 every
documents/embeddings query ran its whole pre-shuffle stage (shingling,
signature GEMMs, classifier features) on 1-2 of 32 cores.

`widen()` round-robin repartitions a freshly-scanned frame up to the
cluster's defaultParallelism, but ONLY when the scan arrives with
fewer partitions than that — at production scale inputs come in with
thousands of splits and this is a no-op, so the cost (one exchange of
the raw rows, sub-second for these tables) is paid exactly when the
parallelism is otherwise capped at the file count.  Round-robin is
safe under retries: Spark sorts before repartitioning
(spark.sql.execution.sortBeforeRepartition, default on) and the scan
is deterministic.  No engine result depends on partition layout
(no spark_partition_id / monotonically_increasing_id / rand anywhere
in the tree), so plans change but hashes cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Ensure at least defaultParallelism partitions; no-op when the
    input already has that many."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
