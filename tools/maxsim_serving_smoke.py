"""MaxSim serving smoke (r10; 1M point + component isolation r11):
corpus-scan vs index-served walls at two corpus scales 10× apart.

The scan path re-tokenizes + re-embeds every distinct corpus token per
query; the indexed path reads the persisted vocab + the fixed-width
(tok, id) postings.  The claim to verify: both return IDENTICAL integer
rankings, and the indexed wall stays vocab/postings-bound while the
scan's grows with corpus text.

r11 (VERDICT r10 task 7) adds per-scale isolation of the two serving
components the corpus-independence claim rests on: the VOCAB-SCAN leg
(tokvecs distinct + broadcast-query dot agg — vocab-sized, so its wall
must not track corpus growth once the derived vocab saturates) and the
PRUNED POSTINGS READ (bytes under the pbk partition dirs the positive
dots actually select vs the dataset total).

Run: python tools/maxsim_serving_smoke.py [n_small]
(n_small=100000 gives the 100k + 1M pair)
"""
import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")

N1 = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from vector_db_at_home_spark.operators.featurize import (
    maxsim_index_load,
    maxsim_index_save,
    maxsim_search,
    maxsim_search_indexed,
)

WORDS = ["vector", "merge", "batch", "store", "query", "index", "token",
         "stream", "shard", "probe", "rank", "fuse", "scan", "cache"]


def corpus(n):
    # ~30 tokens/doc from a 10k-word derived vocab (word + doc-hash
    # suffixes), plus planted query-term hits on a 1% slice
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(WORDS[i % len(WORDS)]),
                       (F.pmod(F.xxhash64(F.col("id") + i), F.lit(700))))
              for i in range(30)],
        ).alias("text"),
    )
    return base.withColumn(
        "text",
        F.when(F.col("doc_id") % 100 == 0,
               F.concat(F.col("text"), F.lit(" vector merge batch")))
        .otherwise(F.col("text")),
    )


terms = ["vector", "merge", "batch"]
out = {"terms": terms, "scales": []}
import tempfile

for n in (N1, 10 * N1):
    docs = corpus(n).repartition(32).cache()
    docs.count()
    path = tempfile.mkdtemp(prefix=f"ms_smoke_{n}_")
    t0 = time.time()
    maxsim_index_save(docs, "text", "doc_id", path, dim=16, n_buckets=64)
    build = round(time.time() - t0, 2)
    idx = maxsim_index_load(spark, path)

    t0 = time.time()
    scan = [tuple(r) for r in maxsim_search(
        docs, terms, "text", "doc_id", k=10, dim=16).collect()]
    scan_wall = round(time.time() - t0, 2)
    t0 = time.time()
    served = [tuple(r) for r in maxsim_search_indexed(
        idx, terms, k=10).collect()]
    warm = round(time.time() - t0, 2)
    t0 = time.time()
    served2 = [tuple(r) for r in maxsim_search_indexed(
        idx, terms, k=10).collect()]
    warm2 = round(time.time() - t0, 2)

    # component isolation (r11): the vocab-scan + dot leg alone, and the
    # pruned postings bytes the winner tokens' pbk partitions cover
    import os

    from vector_db_at_home_spark.operators.featurize import (
        _tok_pbk,
        _token_vectors,
    )

    qdf = spark.createDataFrame([(t.lower(),) for t in terms], "qt string")
    qvec = _token_vectors(qdf, "qt", 16, "qval")
    t0 = time.time()
    dots = (idx.tokvecs.distinct()
            .join(F.broadcast(qvec), "bucket")
            .groupBy("tok", "qt")
            .agg(F.sum(F.col("val") * F.col("qval")).alias("dot")))
    pbks = sorted({r["pbk"] for r in dots.filter(F.col("dot") > 0)
                   .withColumn("pbk",
                               _tok_pbk(F.col("tok"), idx.n_buckets))
                   .select("pbk").distinct().collect()})
    vocab_scan_s = round(time.time() - t0, 2)

    def dir_bytes(d):
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _dirs, files in os.walk(d) for f in files)

    out["scales"].append({
        "n_docs": n,
        "vocab_rows": spark.read.parquet(f"{path}/tokvecs").count(),
        "postings_rows": spark.read.parquet(f"{path}/postings").count(),
        "index_build_s": build,
        "scan_wall_s": scan_wall,
        "indexed_wall_s": min(warm, warm2),
        "vocab_scan_s": vocab_scan_s,
        "postings_pbk_selected": len(pbks),
        "postings_bytes_total": dir_bytes(f"{path}/postings"),
        "postings_bytes_pruned": sum(
            dir_bytes(f"{path}/postings/pbk={b}") for b in pbks),
        "identical": scan == served == served2,
    })
    docs.unpersist()
print(json.dumps(out))
spark.stop()
