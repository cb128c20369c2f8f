"""Property-based parity for the generic joins (operators/asof.py,
operators/rangejoin.py) against an INDEPENDENT second oracle — pandas
``merge_asof`` and a brute-force pandas containment filter — on
hypothesis-generated inputs.  The DuckDB parity tests cover the real
event tables; these sweep the edge shapes (empty sides, all-tie
timestamps, boundary hits, single-key skew) that fixed data never
produces.

Spark-session examples are expensive, so example counts are small and
each example runs one job per direction; hypothesis still shrinks any
failure to a minimal frame.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from greenexp_r_spark.operators import asof as AS
from greenexp_r_spark.operators import rangejoin as RJ

_T0 = dt.datetime(2024, 1, 1)

# (key, seconds) pools kept tiny so ties and shared keys are frequent
_key = st.integers(min_value=0, max_value=2)
_sec = st.integers(min_value=0, max_value=20)

_left_rows = st.lists(st.tuples(_key, _sec), min_size=0, max_size=12)
_right_rows = st.lists(st.tuples(_key, _sec), min_size=0, max_size=12,
                       unique=True)  # unique (key, ts): merge_asof
                                     # tie choice is input-order, ours
                                     # is max-tiebreak — unique right
                                     # rows make both deterministic


def _ts(s: int) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=int(s))


@settings(max_examples=20, deadline=None)
@given(left=_left_rows, right=_right_rows,
       direction=st.sampled_from(["backward", "forward"]),
       tol_s=st.one_of(st.none(), st.integers(min_value=0, max_value=8)))
def test_asof_matches_pandas_merge_asof(spark, left, right,
                                        direction, tol_s):
    ldf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(left)],
        "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        [(k, _ts(s), 100 + i) for i, (k, s) in enumerate(right)],
        "k long, ts timestamp, val long")
    got = AS.asof_join(ldf, rdf, key="k", payload=["val"],
                       direction=direction,
                       tolerance_us=None if tol_s is None
                       else tol_s * 1_000_000).toPandas()

    # explicit dtypes: empty lists otherwise land as object columns,
    # which merge_asof rejects as incompatible merge keys
    lp = pd.DataFrame(
        {"lid": pd.array(range(len(left)), dtype="int64"),
         "k": pd.array([k for k, _ in left], dtype="int64"),
         "ts": pd.to_datetime([_ts(s) for _, s in left])}
    ).sort_values("ts")
    rp = pd.DataFrame(
        {"k": pd.array([k for k, _ in right], dtype="int64"),
         "ts": pd.to_datetime([_ts(s) for _, s in right]),
         "val": pd.array([100 + i for i in range(len(right))],
                         dtype="int64")}
    ).sort_values("ts")
    want = pd.merge_asof(
        lp, rp, on="ts", by="k", direction=direction,
        tolerance=None if tol_s is None else pd.Timedelta(seconds=tol_s),
        suffixes=("", "_r"))

    g = got.set_index("lid")
    w = want.set_index("lid")
    assert len(g) == len(left)
    for lid in w.index:
        gv, wv = g.loc[lid, "asof_val"], w.loc[lid, "val"]
        assert (pd.isna(gv) and pd.isna(wv)) or gv == wv, (
            f"lid={lid}: spark={gv} pandas={wv}")


@settings(max_examples=20, deadline=None)
@given(points=st.lists(st.tuples(_key, _sec), min_size=0, max_size=10),
       intervals=st.lists(st.tuples(_key, _sec, _sec),
                          min_size=0, max_size=8),
       closed=st.sampled_from(["both", "left", "right", "neither"]),
       width=st.sampled_from([None, 1, 5]))
def test_range_join_matches_bruteforce(spark, points, intervals,
                                       closed, width):
    iv = [(k, min(a, b), max(a, b)) for k, a, b in intervals]
    pdf = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(points)],
        "pid long, k long, v long")
    ivdf = spark.createDataFrame(
        [(i, k, lo, hi) for i, (k, lo, hi) in enumerate(iv)],
        "iid long, k long, lo long, hi long")
    got = {(r["pid"], r["iid"])
           for r in RJ.range_join(pdf, ivdf, "v", "lo", "hi",
                                  keys=["k"], closed=closed,
                                  bucket_width=width).collect()}

    def ok(v, lo, hi):
        lo_ok = lo <= v if closed in ("both", "left") else lo < v
        hi_ok = v <= hi if closed in ("both", "right") else v < hi
        return lo_ok and hi_ok

    want = {(pi, ii)
            for pi, (pk, v) in enumerate(points)
            for ii, (ik, lo, hi) in enumerate(iv)
            if pk == ik and ok(v, lo, hi)}
    assert got == want
