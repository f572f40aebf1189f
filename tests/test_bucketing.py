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
