

def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key join with ZERO exchanges,
    and the result matches the plain shuffled join exactly."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.sources.layout import write_bucketed

    # (warehouse dir is a static conf — the managed test tables land in
    # the default warehouse and are DROPped at the end, files included)
    # force the sort-merge path: a broadcast join would trivially have
    # no hash exchange and prove nothing about bucket co-location
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 97).alias("va"))
    b = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 89).alias("vb"))
    write_bucketed(a, "t_bucket_a", "k", n_buckets=8, sort_col="k")
    write_bucketed(b, "t_bucket_b", "k", n_buckets=8, sort_col="k")

    ta, tb = spark.table("t_bucket_a"), spark.table("t_bucket_b")
    joined = ta.join(tb, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("va") * F.col("vb")).alias("s"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: no shuffle anywhere between the scans and the join
    assert "Exchange hashpartitioning" not in plan, plan

    expect = a.join(b, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("va") * F.col("vb")).alias("s"),
    ).collect()
    assert joined.collect() == expect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    spark.sql("DROP TABLE t_bucket_a")
    spark.sql("DROP TABLE t_bucket_b")
