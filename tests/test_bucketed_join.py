"""Bucketed co-located join: the 100 TB join strategy the scale notes
throughout the repo point at ("at scale, bucket both tables by the join
key and the shuffle disappears") — proven here end-to-end on a real
bucketed write + join plan.

Writing both sides ``bucketBy(N, key)`` pre-hash-partitions the data on
disk; Spark's scan then reports the bucketing as its output partitioning,
so SortMergeJoin needs NO Exchange on either side. That is exactly the
plan a 1000-executor cluster wants for the orders⋈lineitem backbone: the
only data movement is the local sort within already-co-located buckets.
"""

from __future__ import annotations

import pytest

from data_ingestion_api_system_spark.plans import formatted_plan
from data_ingestion_api_system_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 4


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "bt_lineitem"))
        .mode("overwrite")
        .saveAsTable("bt_lineitem")
    )
    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "bt_orders"))
        .mode("overwrite")
        .saveAsTable("bt_orders")
    )
    yield li, orders
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_join_runs_without_shuffle(spark, bucketed_tables):
    li, orders = bucketed_tables
    # forbid broadcast so the test proves the co-located SMJ path, not a
    # small-table shortcut
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("bt_lineitem")
        b = spark.table("bt_orders")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
        # and it computes the same join the unbucketed tables do
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_on_point_lookup(spark, bucketed_tables):
    """A point predicate on the bucket key scans only the matching bucket
    (numBuckets-fold less IO) — the bucketed analogue of partition
    pruning. Spark's planner auto-disables bucketed scans when no operator
    needs the distribution, so the test pins autoBucketedScan off (the
    setting a lookup-heavy deployment would choose) to exercise pruning.
    """
    from pyspark.sql import functions as F

    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "false")
        a = spark.table("bt_lineitem").filter(F.col("l_orderkey") == 7)
        plan = formatted_plan(a)
        assert "Bucketed: true" in plan
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan
        n = a.count()
        li = load_table(spark, SF_DIR, "lineitem")
        assert n == li.filter(F.col("l_orderkey") == 7).count()
    finally:
        spark.conf.set(conf, prev)
