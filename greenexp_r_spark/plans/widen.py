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

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

# below this source size the single-task compute is already
# sub-second, so the exchange is pure overhead (measured at sf0.1:
# ~+0.2-0.4 s per query across the exposure family for zero gain)
WIDEN_MIN_BYTES = 4 << 20


def widen(df: DataFrame,
          bytes_per_task: int | None = None) -> DataFrame:
    """Ensure enough scan partitions; no-op when the input already
    has them, or when the source files are small enough
    (< WIDEN_MIN_BYTES) that the repartition exchange costs more than
    the parallelism is worth.  The size check is a driver-side file
    listing — no Spark job.

    Default target: defaultParallelism (right for per-row-HEAVY map
    stages that want every core).  With `bytes_per_task`, the target
    is source_bytes // bytes_per_task capped at defaultParallelism —
    for consumers that run MANY short sequential jobs over the frame
    (the IVF/Lloyd driver loops), where per-task scheduling overhead
    on 32 near-empty partitions costs more than the lost parallelism
    (A/B at sf1.0: q_ann_topk 5.1 s at 8 partitions vs 7.5 s at 32).
    Both targets grow with the input, so neither is a local[32]-only
    constant."""
    sc = df.sparkSession.sparkContext
    tot = None
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        try:
            tot = sum(os.path.getsize(urlparse(f).path) for f in files)
            if tot < WIDEN_MIN_BYTES:
                return df
        except OSError:
            pass
    target = sc.defaultParallelism
    if bytes_per_task and tot:
        target = max(2, min(target, int(tot) // int(bytes_per_task)))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
