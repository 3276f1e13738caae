"""Measure NN-descent graph recall over ALL nodes at a given sf dir.

Usage: python tools/measure_graph_recall.py /root/testdata/sf0.1 [k] [bucket] [variant]
variant: base | revint  (revint = include undirected view in candidates)
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_db_at_home_spark.session import get_spark
from vector_db_at_home_spark.sources import load_table
from vector_db_at_home_spark.operators.knngraph import knn_graph_nndescent


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    bucket = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark("measure_graph_recall")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"n={n} k={k} bucket={bucket}")

    t0 = time.time()
    graph = knn_graph_nndescent(emb, "vec_id", "embedding", k=k,
                                init_bucket_size=bucket)
    graph = graph.localCheckpoint(eager=True)
    t1 = time.time()

    # exact top-5 per node (self excluded) via self-join
    v = emb.select(F.col("vec_id").alias("id"),
                   F.col("embedding").cast("array<double>").alias("vec"))
    a = v.select(F.col("id").alias("src"), F.col("vec").alias("va"))
    b = v.select(F.col("id").alias("dst"), F.col("vec").alias("vb"))
    d2 = F.aggregate(F.zip_with(F.col("va"), F.col("vb"),
                                lambda x, y: (x - y) * (x - y)),
                     F.lit(0.0), lambda acc, x: acc + x)
    pairs = (a.crossJoin(b).filter(F.col("src") != F.col("dst"))
             .select("src", "dst", d2.alias("d2")))
    w = Window.partitionBy("src").orderBy(F.col("d2").asc(), F.col("dst").asc())
    exact = (pairs.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= 5).select("src", "dst"))
    hits = exact.join(graph.select("src", "dst"), ["src", "dst"]).count()
    total = exact.count()
    print(f"build={t1-t0:.1f}s recall@5 = {hits}/{total} = {hits/total:.4f}")
    # per-node min hits distribution
    per = (exact.join(graph.select("src", "dst").withColumn("hit", F.lit(1)),
                      ["src", "dst"], "left")
           .groupBy("src").agg(F.sum(F.coalesce("hit", F.lit(0))).alias("h")))
    dist = per.groupBy("h").count().orderBy("h").collect()
    print("hits-per-node distribution:", [(r["h"], r["count"]) for r in dist])


if __name__ == "__main__":
    main()
