"""Bucketed co-located joins: the pay-the-shuffle-once layout primitive.

Two tables bucketed on the same keys with the same bucket count must join
and aggregate with NO Exchange in the physical plan — at 100 TB this is
the difference between moving terabytes per join and moving nothing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataflowjavasdk_spark.sources.tables import write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_lines")
    orders = spark.range(0, 2000).select(
        F.col("id").alias("order_id"), (F.col("id") % 7).alias("cust")
    )
    lines = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("order_id"), F.col("id").alias("line_id"),
        (F.col("id") % 13).cast("double").alias("qty"),
    )
    write_bucketed(orders, "bk_orders", ["order_id"], 4, sort_by=["order_id"])
    write_bucketed(lines, "bk_lines", ["order_id"], 4, sort_by=["order_id"])
    yield spark.table("bk_orders"), spark.table("bk_lines")
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_lines")


def _executed_plan(df) -> str:
    df.collect()  # finalize AQE so the executed plan is the real one
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    orders, lines = bucketed_pair
    with_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # Join + aggregate, both on the bucket key: the whole pipeline
        # runs on the materialized layout with zero data movement.
        joined = orders.join(lines, "order_id").groupBy("order_id").agg(
            F.sum("qty").alias("total"), F.first("cust").alias("cust")
        )
        plan = _executed_plan(joined)
        assert "Exchange" not in plan, plan
        # Correctness alongside the plan shape.
        total = joined.agg(F.sum("total")).collect()[0][0]
        assert total == sum((i % 13) * 1.0 for i in range(6000))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_thresh)


def test_unbucketed_same_join_does_exchange(spark, bucketed_pair):
    """Control: the identical join on unbucketed inputs shuffles — proving
    the Exchange elision above comes from the bucketing, not the data size."""
    orders, lines = bucketed_pair
    with_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain_o = orders.repartition(3)  # strip the bucket layout
        plain_l = lines.repartition(3)
        plan = _executed_plan(plain_o.join(plain_l, "order_id"))
        assert "Exchange hashpartitioning" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_thresh)


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also reuses the layout."""
    _, lines = bucketed_pair
    agg = lines.groupBy("order_id").agg(F.sum("qty").alias("s"))
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000
