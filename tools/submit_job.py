"""spark-submit entry point for the north-star pages pipeline.

The north_rule runs the engine "via spark-submit --py-files on a
multi-executor cluster".  This script is that deployment surface: it
imports the engine ONLY from the submitted --py-files zip (no repo
path assumptions), builds the pages table from a documents parquet
directory, runs snapshot dedup → byte-exact extraction → url
geocoding → availability + accessibility exposure, writes the result
as parquet, and prints one JSON line of lineage metrics.

Usage:
    spark-submit --master <...> --py-files greenexp_r_spark.zip \
        tools/submit_job.py <sf_dir> <out_dir>

Verified end-to-end by tests/test_submit.py (local[4], result equals
the in-process q_exposure_pages plan bit-for-bit).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("greenexp-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from greenexp_r_spark.operators import pages_ops

    result = pages_ops.exposure_over_pages(spark, sf_dir)
    result.write.mode("overwrite").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    print(json.dumps({
        "rows": back.count(),
        "n_files": len(back.inputFiles()),
        "columns": sorted(back.columns),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
