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


def test_restart_from_checkpoint_no_loss_no_dup(spark, tmp_path):
    """Kill-and-restart recovery (VERDICT r03 'Next round #9'): drain
    half the capture files, stop, deliver the rest, restart from the
    SAME checkpoint — the final snapshot must equal the batch answer
    over everything, and per-url capture COUNTS must match exactly
    (counts catch both loss and replay; the max-struct alone would
    hide a duplicated file)."""
    import os
    import pandas as pd

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    indir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)
    # two deliveries, disjoint by doc_id parity (urls overlap across
    # deliveries is fine — state must merge them)
    docs.where("doc_id % 2 = 0").repartition(1) \
        .write.parquet(indir + "/batch1", compression="none")
    for f in os.listdir(indir + "/batch1"):
        if f.endswith(".parquet"):
            os.rename(f"{indir}/batch1/{f}", f"{indir}/p1_{f}")
    first = pages_stream.run_snapshot_available_now(
        spark, indir, table_name="snap_restart", checkpoint=ckpt
    ).toPandas()
    assert len(first) > 0
    # second delivery lands AFTER the first query terminated ("crash")
    docs.where("doc_id % 2 = 1").repartition(1) \
        .write.parquet(indir + "/batch2", compression="none")
    for f in os.listdir(indir + "/batch2"):
        if f.endswith(".parquet"):
            os.rename(f"{indir}/batch2/{f}", f"{indir}/p2_{f}")
    got = pages_stream.run_snapshot_available_now(
        spark, indir, table_name="snap_restart2", checkpoint=ckpt
    ).toPandas()

    from greenexp_r_spark.operators import pages_ops
    full = P.pages_df(spark, SF_TEST)
    want = (pages_ops.extract_text(pages_ops.latest_snapshot(full))
            .select("url", "warc_ts", "n_chars", "lang").toPandas())
    counts = (full.groupBy("url").count()
              .withColumnRenamed("count", "n_captures").toPandas())
    want = want.merge(counts, on="url")
    cols = ["url", "warc_ts", "n_chars", "lang", "n_captures"]
    got = got[cols].sort_values("url").reset_index(drop=True)
    want = want[cols].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
