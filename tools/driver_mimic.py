"""Mimic the driver's verify: entry() smoke + queries() vs oracle_sql().

Default sf0.01 (the driver's gate scale); set GATE_SF_DIR to re-run the
whole gate at another scale (the sf0.1 robustness pass is recorded in
BENCH/BASELINE.md)."""
import hashlib, json, os, sys, time
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as E
from greenexp_r_spark.session import build_session

SF = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.01")
spark = build_session(master="local[8]", shuffle_partitions=16)

t0 = time.time()
df = E.entry(spark)
n = df.count()
print(f"entry(): {n} rows, schema={[f.name for f in df.schema.fields]}, {time.time()-t0:.1f}s")
assert n >= 0

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def vhash(pdf):
    # Type-sensitive: the real driver hashes typed values, so an int64
    # Spark column vs a HUGEINT→float64/object DuckDB column must
    # mismatch here too (round-1 lesson: to_csv masked exactly that).
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    # dtype *kind* only: int32 vs int64 is representation (driver matches
    # those), but int vs float/object (the HUGEINT trap) must mismatch
    kinds = [d.kind for d in pdf.dtypes]
    payload = repr(kinds) + "\n" + pdf.to_csv(index=False, float_format="%.17g")
    return hashlib.md5(payload.encode()).hexdigest()

qs, os_ = E.queries(), E.oracle_sql()
results = {}
for name, fn in qs.items():
    t0 = time.time()
    sdf = fn(spark, SF).toPandas()
    o = con.sql(os_[name]).df() if name in os_ else None
    if o is None:
        results[name] = f"rows-only: {len(sdf)} rows"
    else:
        match = (len(sdf) == len(o)) and (sorted(sdf.columns) == sorted(o.columns)) and (vhash(sdf) == vhash(o))
        results[name] = f"{'MATCH' if match else 'MISMATCH'} rows={len(sdf)}/{len(o)} {time.time()-t0:.1f}s"
    print(name, "->", results[name])

bad = [k for k,v in results.items() if "MISMATCH" in v]
print(json.dumps(results, indent=2))
print("VERDICT:", "ALL MATCH" if not bad else f"FAILED: {bad}")
spark.stop()
