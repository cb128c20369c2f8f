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
          bytes_per_task: int | None = 512 * 1024) -> DataFrame:
    """Ensure enough scan partitions; no-op when the input already
    has them, or when the source files are small enough
    (< WIDEN_MIN_BYTES) that the repartition exchange costs more than
    the parallelism is worth.  The size check is a driver-side file
    listing — no Spark job.

    Target: source_bytes // bytes_per_task, capped at
    defaultParallelism.  512 KB per task A/B'd faster than a flat
    defaultParallelism target for EVERY widened consumer at sf1.0
    (q_ann_topk 7.5 → 4.0 s, q_exposure_pages 2.2 → 1.7,
    q_knn_parks 2.9 → 2.1, q_quality_classifier 2.0 → 1.6, ...):
    32 near-empty partitions cost more per-task scheduling across the
    many jobs of a query than the extra cores return.  The target
    grows with the input and saturates at the core count, so it is
    not a local[32]-only constant; pass bytes_per_task=None to force
    the flat defaultParallelism target."""
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
