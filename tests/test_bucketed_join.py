"""Bucketed co-located joins: pre-partitioned tables join with NO
exchange — the pay-the-shuffle-once-at-ingest strategy for 100 TB
fact-fact joins."""

from __future__ import annotations

import pyspark.sql.functions as F

from protarrow_spark.sources.sinks import write_bucketed
from protarrow_spark.sources.tables import table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # warehouse.dir is a static conf; managed tables land in the
    # session default and are dropped (files removed) in the finally.
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(li, "lineitem_b", "o_orderkey", 8, sort_col="o_orderkey")

    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    # Disable broadcast so the join would otherwise need a shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        # results still correct vs the plain-table join
        expected = (
            table(spark, sf_dir, "orders")
            .select("o_orderkey")
            .join(li, "o_orderkey")
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
