"""Spot-check a subset of gate queries against their DuckDB oracles.

Usage: python tools/check_queries.py q_isochrone q_text_profile ...
Same vhash semantics as tools/driver_mimic.py; sf via GATE_SF_DIR.
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import duckdb

import __spark_entry__ as E
from greenexp_r_spark.session import build_session

SF = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.01")


def vhash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns),
                          kind="mergesort").reset_index(drop=True)
    kinds = [d.kind for d in pdf.dtypes]
    payload = repr(kinds) + "\n" + pdf.to_csv(index=False,
                                              float_format="%.17g")
    return hashlib.md5(payload.encode()).hexdigest()


def main():
    names = sys.argv[1:]
    spark = build_session(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    qs, os_ = E.queries(), E.oracle_sql()
    bad = []
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, SF).toPandas()
        if name not in os_:
            print(f"{name} -> rows-only: {len(sdf)} rows")
            continue
        o = con.sql(os_[name]).df()
        ok = (len(sdf) == len(o)
              and sorted(sdf.columns) == sorted(o.columns)
              and vhash(sdf) == vhash(o))
        print(f"{name} -> {'MATCH' if ok else 'MISMATCH'} "
              f"rows={len(sdf)}/{len(o)} {time.time() - t0:.1f}s")
        if not ok:
            bad.append(name)
            if sorted(sdf.columns) != sorted(o.columns):
                print("  spark cols:", sorted(sdf.columns))
                print("  oracle cols:", sorted(o.columns))
    print("VERDICT:", "ALL MATCH" if not bad else f"FAILED: {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
