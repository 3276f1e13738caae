"""Stage-level profile of dedup_minhash_lsh at a given sf dir.

Times (min of N): shingle pass, signature aggregation, band explode +
self-join candidates, full verified pairs.  Run on a quiet box.

Usage: python tools/profile_minhash.py [sf_dir] [n_reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_at_home_spark.session import get_spark
from vector_db_at_home_spark.sources import load_table


def timeit(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile_minhash")
    spark.sparkContext.setLogLevel("ERROR")
    from vector_db_at_home_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm scan

    sh = D.hashed_shingles(docs, "text", "doc_id", 3, 100)
    print("shingles:", round(timeit(lambda: sh.count(), reps), 3))

    band_rows, sizes = D._signature_bands(sh, D.NUM_PERM_DEFAULT,
                                          D.BANDS_DEFAULT)
    print("signature_bands:", round(timeit(lambda: band_rows.count(), reps), 3))

    # ---- fused variant A (VERDICT r6 task 3): slot array exploded to
    # (id, slot, val), ONE min buffer per (id, slot), reassembled by a
    # collect_list — one "logical" aggregate expression, two shuffles
    from pyspark.sql import functions as F

    specs = D._perm_specs(D.NUM_PERM_DEFAULT)
    slot_vals = F.array(*[
        (F.col(qa) + m * F.col(qb)).alias(f"s{i}")
        for i, (qa, qb, m) in enumerate(specs)
    ])
    ex = sh.select("id", F.posexplode(slot_vals).alias("slot", "val"))
    mins = ex.groupBy("id", "slot").agg(F.min("val").alias("h"))
    sig_a = mins.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("slot", "h"))),
            lambda s: s["h"],
        ).alias("sig")
    )
    print("fusedA_exploded_sig:", round(timeit(lambda: sig_a.count(), reps), 3))

    # ---- fused variant B: ONE agg buffer per doc — Arrow grouped-agg
    # pandas UDF folding the slot arrays element-wise (no partial agg:
    # every shingle row shuffles to its group)
    import pandas as pd
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def arrmin(vals: pd.Series) -> list:
        return np.vstack(vals.to_numpy()).min(axis=0).tolist()

    sig_b = sh.select("id", slot_vals.alias("sv")).groupBy("id") \
        .agg(arrmin("sv").alias("sig"))
    print("fusedB_pandas_sig:", round(timeit(lambda: sig_b.count(), reps), 3))

    full = D.minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=0.5,
                               max_doc_freq=100, max_band_bucket=200)
    print("full_pairs:", round(timeit(lambda: full.count(), reps), 3))


if __name__ == "__main__":
    main()
