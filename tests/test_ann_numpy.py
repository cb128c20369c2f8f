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


def _emb(spark):
    return spark.read.parquet(f"{SF_TEST}/embeddings.parquet")


def test_jl_projection_matches_numpy_reference(spark):
    emb = _emb(spark)
    got = {r["vec_id"]: (np.array(r["q"]), r["norm2"])
           for r in similarity.project_jl(emb).collect()}
    ref_in = {r["vec_id"]: np.array(r["q"], dtype=np.int64)
              for r in similarity.quantized(emb).collect()}
    S = similarity.jl_sign_matrix(len(next(iter(ref_in.values()))))
    assert set(S.flatten()) <= {-1, 1}
    for vid, q in ref_in.items():
        p = q @ S
        gp, gn = got[vid]
        assert (gp == p).all()
        assert gn == int((p * p).sum())


def test_jl_sign_matrix_matches_sql_formula(spark):
    import duckdb
    S = similarity.jl_sign_matrix(8, 4)
    rows = duckdb.connect().execute(
        f"""SELECT i.i, j.j,
                   (1 - 2 * (((i.i * {similarity.JL_A}
                              + j.j * {similarity.JL_B}
                              + {similarity.JL_C})
                              % 2147483647) & 1)) AS s
            FROM (SELECT unnest(generate_series(0, 7)) AS i) i
            CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j"""
    ).fetchall()
    for i, j, s in rows:
        assert S[i, j] == s


def test_jl_topk_shape_and_determinism(spark):
    emb = _emb(spark)
    a = sorted(map(tuple, similarity.jl_topk(emb).collect()))
    b = sorted(map(tuple, similarity.jl_topk(emb).collect()))
    assert a == b and len(a) > 0
    # every query present with exactly ANN_K ranked neighbors
    from greenexp_r_spark import constants as C
    qids = {t[0] for t in a}
    assert len(a) == len(qids) * C.ANN_K
