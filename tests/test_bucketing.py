"""Bucketed co-located join: the 100 TB pattern for repeated fact-fact
joins — pre-bucket both tables on the join key so the join needs NO
exchange at query time (the shuffle is paid once at write time).

The test writes orders and lineitem bucketed by orderkey into a temp
warehouse, joins them, and asserts the physical plan contains no
Exchange — proving Catalyst recognized the co-location. This is the
mechanism `tables.BROADCAST_TABLES` can't cover: both sides too big to
broadcast, joined repeatedly on the same key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    try:
        o = spark.read.parquet(f"{SF}/orders.parquet")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .option("path", str(tmp_path / "orders_b"))
         .mode("overwrite").saveAsTable("bucketdemo.orders_b"))
        (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .option("path", str(tmp_path / "lineitem_b"))
         .mode("overwrite").saveAsTable("bucketdemo.lineitem_b"))

        ob = spark.table("bucketdemo.orders_b")
        lb = spark.table("bucketdemo.lineitem_b")
        # at this tiny SF Catalyst would (correctly) broadcast; disable
        # it so the plan shows the big-big case bucketing is for
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey) \
                       .groupBy("o_orderpriority") \
                       .agg(F.count("*").alias("n"))
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # the join itself must not shuffle either side — only the
            # final low-cardinality aggregation may exchange
            join_part = plan.split("HashAggregate")[-1]
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in join_part, \
                f"bucketed join shuffled:\n{plan}"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # and results match the plain join
        plain = (spark.read.parquet(f"{SF}/orders.parquet")
                 .join(spark.read.parquet(f"{SF}/lineitem.parquet"),
                       F.col("o_orderkey") == F.col("l_orderkey"))
                 .groupBy("o_orderpriority").agg(F.count("*").alias("n")))
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")


def test_ann_index_as_partition_column_prunes_scan(spark, tmp_path):
    """The ANN docstrings claim 'at 100 TB the LSH bucket / IVF cell
    becomes a partition column so probes are partition prunes' — prove
    it: materialize embeddings partitioned by cell, probe one cell, and
    assert the scan reads ONLY that partition (PartitionFilters in the
    plan, partition count 1), with results identical to the unpruned
    filter."""
    from aether_firebase_consumer_spark.functions.vectors import (
        ivf_cell, ivf_centroids,
    )
    cents = ivf_centroids("afcs-ivf-v1", k=16, dim=64)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .withColumn("cell", ivf_cell(F.col("embedding"), cents))
    path = str(tmp_path / "emb_by_cell")
    emb.write.partitionBy("cell").parquet(path)

    indexed = spark.read.parquet(path)
    target = emb.groupBy("cell").count().orderBy(F.desc("count")) \
        .first()["cell"]
    probe = indexed.filter(F.col("cell") == int(target))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cell" in pf, plan  # the probe predicate prunes partitions
    # physical proof: only 1 of 16 partition dirs feeds the scan
    n_parts = probe.select(F.input_file_name()).distinct().count()
    all_parts = indexed.select(F.input_file_name()).distinct().count()
    assert n_parts < all_parts
    got = {r["vec_id"] for r in probe.collect()}
    want = {r["vec_id"] for r in emb.filter(F.col("cell") == int(target))
            .collect()}
    assert got == want and got
