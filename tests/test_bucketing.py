"""Bucketed-table join (SCALE.md): pre-shuffled layout so the big
recurring join runs with NO exchange on either side — the 100 TB
co-located-join primitive. Uses a session-scoped warehouse under the
repo scratch dir."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from tests.conftest import SF0001
from tests.test_plans import plan_of


def test_bucketed_join_has_no_shuffle(spark):
    import shutil

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    spark.sql("DROP TABLE IF EXISTS bucketdemo.orders_b")
    spark.sql("DROP TABLE IF EXISTS bucketdemo.customer_b")
    # in-memory catalog: DROP TABLE forgets orphaned managed dirs
    shutil.rmtree("/root/repo/.scratch/warehouse/bucketdemo.db", ignore_errors=True)

    read_table(spark, SF0001, "orders").write.bucketBy(8, "o_custkey").sortBy(
        "o_custkey"
    ).mode("overwrite").saveAsTable("bucketdemo.orders_b")
    read_table(spark, SF0001, "customer").write.bucketBy(8, "c_custkey").sortBy(
        "c_custkey"
    ).mode("overwrite").saveAsTable("bucketdemo.customer_b")

    o = spark.table("bucketdemo.orders_b")
    c = spark.table("bucketdemo.customer_b")
    # disable auto-broadcast so the join would otherwise shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = plan_of(j)
        assert "SortMergeJoin" in plan
        # exactly ONE exchange may exist: the post-aggregation one —
        # the join itself reads both bucketed sides shuffle-free
        exchanges = re.findall(r"\(\d+\) Exchange", plan)
        assert len(exchanges) == 1, plan
        # and the result is still right
        got = {r["c_mktsegment"]: r["n"] for r in j.collect()}
        want = {
            r["c_mktsegment"]: r["n"]
            for r in read_table(spark, SF0001, "orders")
            .join(
                read_table(spark, SF0001, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
