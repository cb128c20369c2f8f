"""Checkpoint / resume via a per-partition manifest table (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

The reference's closest analog is continuous append-save
(vgvi_from_sf.R:177-182, 309-311: each chunk appended to a GPKG as it
finishes).  Here the unit of work is a deterministic partition of the
input key space; each completed unit writes, atomically with its
output, a manifest row:

    (run_id, part_id, rows_in, rows_out, text_checksum, finished_at)

A resumed run anti-joins the pending unit list against the manifest
and recomputes only missing units.  `text_checksum` is the xor-fold of
xxhash64(text) over the unit's input rows — the byte-identical-text
invariant (input_hint P20) is verified by recomputing it on resume.

At cluster scale the same layout works on any atomic-rename store
(one parquet dir per unit + manifest appends); the driver-side loop
below is per-*unit*, not per-row — units are coarse (dozens to
thousands), each unit is a full distributed Spark job slice.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = ("run_id string, part_id int, rows_in long, "
                   "rows_out long, text_checksum long, finished_at double")


@dataclass
class CheckpointedRun:
    base_dir: str
    run_id: str
    n_parts: int

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.base_dir, "_manifest")

    def output_dir(self, part_id: int) -> str:
        return os.path.join(self.base_dir, f"part={part_id}")


def _unit_checksum(df: DataFrame, text_col: str):
    """Order-independent 64-bit fold of per-row text hashes (xor via
    bit_xor aggregate — associative/commutative, safe under any
    partitioning)."""
    # coalesce: bit_xor over zero rows is NULL, which would crash the
    # int() coercion downstream — an empty unit checksums to 0
    return df.agg(
        F.expr(f"coalesce(bit_xor(xxhash64({text_col})), 0)").alias("cksum"),
        F.count(F.lit(1)).alias("n")).collect()[0]


def completed_parts(spark: SparkSession, run: CheckpointedRun) -> set[int]:
    try:
        m = spark.read.schema(MANIFEST_SCHEMA).json(run.manifest_dir)
        return {r.part_id for r in
                m.where(F.col("run_id") == run.run_id)
                 .select("part_id").distinct().collect()}
    except Exception:
        return set()


def run_checkpointed(spark: SparkSession, source: DataFrame,
                     transform, run: CheckpointedRun,
                     key_col: str = "point_id",
                     text_col: str = "text") -> dict:
    """Execute `transform(unit_df) -> DataFrame` over n_parts hash
    units of `source`, writing each unit's output + manifest row;
    skips units already present in the manifest (resume).

    Returns {"computed": [...], "skipped": [...]}.
    """
    os.makedirs(run.manifest_dir, exist_ok=True)
    done = completed_parts(spark, run)
    computed, skipped = [], []
    units = source.withColumn(
        "_part", F.pmod(F.xxhash64(F.col(key_col)), F.lit(run.n_parts)))
    for part_id in range(run.n_parts):
        if part_id in done:
            skipped.append(part_id)
            continue
        unit = units.where(F.col("_part") == part_id).drop("_part")
        row = _unit_checksum(unit, text_col)
        out = transform(unit)
        out_path = run.output_dir(part_id)
        out.write.mode("overwrite").parquet(out_path)
        rows_out = spark.read.parquet(out_path).count()
        manifest_row = spark.createDataFrame(
            [(run.run_id, part_id, int(row.n), int(rows_out),
              int(row.cksum), time.time())],
            schema=MANIFEST_SCHEMA)
        # manifest written only after the unit's output commit — a
        # failure between the two re-runs the unit (idempotent
        # overwrite), never records an absent output
        manifest_row.write.mode("append").json(run.manifest_dir)
        computed.append(part_id)
    return {"computed": computed, "skipped": skipped}


def verify_text_invariant(spark: SparkSession, source: DataFrame,
                          run: CheckpointedRun,
                          key_col: str = "point_id",
                          text_col: str = "text") -> DataFrame:
    """Recompute each unit's text checksum from the *current* source
    and compare with the manifest — detects any byte drift of the
    carried text (P20).  Returns rows that disagree (empty = intact).
    """
    m = spark.read.schema(MANIFEST_SCHEMA).json(run.manifest_dir) \
             .where(F.col("run_id") == run.run_id)
    cur = (source.withColumn(
               "_part", F.pmod(F.xxhash64(F.col(key_col)),
                               F.lit(run.n_parts)))
           .groupBy("_part")
           .agg(F.expr(f"coalesce(bit_xor(xxhash64({text_col})), 0)")
                .alias("cur_cksum"),
                F.count(F.lit(1)).alias("cur_n")))
    # a unit empty in the current source has no group row → its
    # checksum is the same 0 an empty unit records (see _unit_checksum)
    return (m.join(cur, m.part_id == cur._part, "left")
            .where((F.coalesce(F.col("cur_cksum"), F.lit(0))
                    != F.col("text_checksum"))
                   | (F.coalesce(F.col("cur_n"), F.lit(0))
                      != F.col("rows_in")))
            .select("part_id", "rows_in", "cur_n",
                    "text_checksum", "cur_cksum"))
