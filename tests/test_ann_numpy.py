"""Arrow/numpy ANN path must equal the JVM-expression brute force."""

from __future__ import annotations

import numpy as np

from greenexp_r_spark.operators import similarity

from .conftest import SF_TEST


def test_numpy_topk_equals_expression_topk(spark):
    emb = spark.read.parquet(f"{SF_TEST}/embeddings.parquet")
    a = (similarity.brute_force_topk(emb).toPandas()
         .sort_values(["query_id", "rank"]).reset_index(drop=True))
    b = (similarity.brute_force_topk_numpy(emb).toPandas()
         .sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert a[["query_id", "rank", "neighbor_id"]].equals(
        b[["query_id", "rank", "neighbor_id"]])
    np.testing.assert_array_equal(a["cos_sim"].to_numpy(),
                                  b["cos_sim"].to_numpy())
