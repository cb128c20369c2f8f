"""Bucketed-table storage for co-located joins (SURVEY §4.3).

A production exposure pipeline re-joins the same keys round after
round: the geocoded pages snapshot joins availability, accessibility
and visibility outputs on the parsed point id; cell-keyed layers join
on cell_id.  Pre-bucketing both sides of a recurring join on the join
key removes the Exchange from EVERY subsequent run — at 10^12 rows
that is the difference between an O(corpus) shuffle per query and
none (the scan itself provides the required hash distribution).

Mechanics: ``bucketBy(n, key).sortBy(key)`` + ``saveAsTable`` writes
parquet whose files are hash-partitioned (and sorted) by the key;
Spark's planner then satisfies the join's distribution requirement
from the table layout (``spark.sql.sources.bucketing.enabled``,
default on) and elides both the Exchange and, with sortBy, the Sort.
Proof: tests/test_bucketing.py asserts the joined plan of two
co-bucketed tables contains NO Exchange while the unbucketed control
does.

Bucket count guidance at scale: pick n_buckets so each bucket file
stays near the scan-split sweet spot (128-512 MB) — for a 100 TB
snapshot that is O(10^5) buckets; skewed keys are not a concern here
because url/point ids are hash-uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int, path: str,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed+sorted by ``key``."""
    (df.write.format("parquet").mode(mode)
       .bucketBy(n_buckets, key).sortBy(key)
       .option("path", path)
       .saveAsTable(table))


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange operators in the executed plan (0 for a fully
    co-located join)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "ReusedExchange" not in line)
