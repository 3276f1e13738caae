"""1M-doc comparison of the MinHash SIGNATURE aggregation forms
(VERDICT r6 task 3): current 64-min-buffer groupBy vs the fused
single-array-buffer pandas grouped-agg.  Records wall AND shuffle bytes
— the fused form cannot do map-side partial aggregation, so its shuffle
volume is the scale verdict, not local wall.

Usage: python tools/profile_minhash_1m.py [n_rows] — prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_smoke import synthetic_docs  # noqa: E402
from tools.scale_smoke_1m import shuffle_totals  # noqa: E402


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import pandas as pd
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from vector_db_at_home_spark.session import get_spark
    from vector_db_at_home_spark.operators import dedup as D

    spark = get_spark("profile_minhash_1m",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    path = "/tmp/minhash_profile_docs"
    if not os.path.exists(path):
        synthetic_docs(spark, int(n_rows * 0.9), n_rows - int(n_rows * 0.9)) \
            .write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    sh = D.hashed_shingles(docs, "text", "doc_id", 3, 100)

    out = {"n_rows": n_rows}
    specs = D._perm_specs(D.NUM_PERM_DEFAULT)

    # current: 64 min buffers, map-side partial agg
    cur = sh.groupBy("id").agg(*[
        F.min(F.col(qa) + m * F.col(qb)).alias(f"h{i}")
        for i, (qa, qb, m) in enumerate(specs)
    ], F.count(F.lit(1)).alias("sz"))
    s0 = shuffle_totals(spark)
    t0 = time.time()
    cur.count()
    out["current_wall"] = round(time.time() - t0, 2)
    s1 = shuffle_totals(spark)
    out["current_shuffle_mb"] = round(
        (s1["write"] - s0["write"]) / 1e6, 1)

    # fused: one array buffer per doc, Arrow grouped-agg (no partial agg)
    slot_vals = F.array(*[
        (F.col(qa) + m * F.col(qb)).alias(f"s{i}")
        for i, (qa, qb, m) in enumerate(specs)
    ])

    @pandas_udf("array<long>")
    def arrmin(vals: pd.Series) -> list:
        return np.vstack(vals.to_numpy()).min(axis=0).tolist()

    fused = sh.select("id", slot_vals.alias("sv")).groupBy("id") \
        .agg(arrmin("sv").alias("sig"), F.count(F.lit(1)).alias("sz"))
    s2 = shuffle_totals(spark)
    t0 = time.time()
    fused.count()
    out["fused_wall"] = round(time.time() - t0, 2)
    s3 = shuffle_totals(spark)
    out["fused_shuffle_mb"] = round(
        (s3["write"] - s2["write"]) / 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
