"""Extra micro-benchmarks (guide §1.4: noop-sink isolation) — NOT part
of the frozen bench.py contract.  Times individual operators/stages so
optimization work can attribute cost inside the composite queries.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [names...]

Each target is timed with df.write.format("noop") so every column of
every row is computed and no sink cost is included.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from greenexp_r_spark.session import build_session
    from greenexp_r_spark.plans.caching import release_caches

    spark = build_session(app="greenexp-bench-extra",
                          master=f"local[{cpus}]",
                          shuffle_partitions=max(int(cpus) * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    from greenexp_r_spark.operators import dedup, similarity
    from greenexp_r_spark.registry import build_registry

    reg = build_registry()

    def emb(s=spark):
        return s.read.parquet(f"{sf}/embeddings.parquet")

    def docs(s=spark):
        return s.read.parquet(f"{sf}/documents.parquet")

    targets = {
        # --- q_ann_topk decomposition ---
        "ann_brute": lambda: similarity.brute_force_topk_numpy(emb()),
        "ann_ivf": lambda: similarity.ivf_topk(emb()),
        "ann_kmeans": lambda: similarity.ivf_topk_trained(emb()),
        "ann_jl": lambda: similarity.jl_topk(emb()),
        # --- q_embedding_neardup decomposition ---
        "nd_corpus": lambda: similarity.neardup_corpus(emb()),
        "nd_keys": lambda: similarity._lsh_band_keys_numpy(
            similarity.neardup_corpus(emb())),
        "nd_pairs": lambda: similarity.neardup_pairs(emb()),
        "nd_groups": lambda: similarity.neardup_groups(emb()),
        # --- dedup decomposition ---
        "dd_aug": lambda: dedup.augmented_corpus(docs()),
        "dd_exact": lambda: dedup.exact_duplicates(
            dedup.augmented_corpus(docs())),
        "dd_minhash": lambda: dedup.minhash_lsh_pairs(
            dedup.augmented_corpus(docs())),
        "dd_simhash": lambda: dedup.simhash_pairs(
            dedup.augmented_corpus(docs())),
    }
    # also allow any registry query by name
    names = sys.argv[1:] or list(targets)
    out = {}
    for name in names:
        release_caches()
        t0 = time.time()
        if name in targets:
            df = targets[name]()
        else:
            df = reg[name].spark(spark, sf)
        _noop(df)
        out[name] = round(time.time() - t0, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"sf": sf, "cpus": int(cpus), "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
