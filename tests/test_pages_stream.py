"""Streaming pages snapshot ≡ batch latest_snapshot."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_TEST

from greenexp_r_spark.sources import pages as P
from greenexp_r_spark.operators import pages_ops
from greenexp_r_spark.streaming import pages_stream


def test_stream_snapshot_equals_batch(spark):
    got = pages_stream.run_snapshot_available_now(
        spark, f"{SF_TEST}/documents.parquet").toPandas()
    want = (pages_ops.extract_text(pages_ops.latest_snapshot(
        P.pages_df(spark, SF_TEST)))
        .select("url", "warc_ts", "n_chars", "lang").toPandas())
    cols = ["url", "warc_ts", "n_chars", "lang"]
    got = got[cols].sort_values("url").reset_index(drop=True)
    want = want[cols].sort_values("url").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
