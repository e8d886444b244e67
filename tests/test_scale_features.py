"""Scale-path features that only show up in physical plans, not results:

- runtime bloom-filter join pruning: a selective dim-side filter is turned
  into a bloom semi-filter on the fact scan BEFORE the shuffle — the
  mechanism that saves the fact-table exchange at 100 TB when the dim side
  is too big to broadcast;
- partitioned-write partition pruning: a predicate on the partition column
  never touches non-matching directories (PartitionFilters, zero data read
  from pruned partitions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_api_system_spark.plans import formatted_plan
from data_ingestion_api_system_spark.sources.formats import read_table, write_table
from tests.conftest import SF_DIR


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """With broadcast disabled (the can't-broadcast regime), Spark should
    inject a bloom_filter_agg on the filtered orders side and apply
    might_contain on the lineitem side — and the join result must be
    unchanged by the rewrite."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        lo = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = lo.join(o, lo.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = formatted_plan(j)
        assert "bloom_filter_agg" in plan, "runtime bloom filter not injected"
        bloom_rows = {(r.o_orderpriority, r.n) for r in j.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # same join without the rewrite must agree
    lo = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    )
    plain = {
        (r.o_orderpriority, r.n)
        for r in lo.join(o, lo.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert bloom_rows == plain and bloom_rows


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = str(tmp_path / "orders_by_priority")
    write_table(orders, out, fmt="parquet", partition_by=["o_orderpriority"])

    back = read_table(spark, out, fmt="parquet")
    q = back.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan and "1-URGENT" in plan
    # pruning must not change answers
    expected = orders.filter("o_orderpriority = '1-URGENT'").count()
    assert q.count() == expected > 0


def test_aqe_splits_skewed_join_partition(spark):
    """Skew countermeasure named in SCALE.md: AQE must detect a hot join
    key at runtime and split its shuffle partition (thresholds lowered so
    a ~20 MB hot key triggers at test scale). Asserts the final adaptive
    plan actually ran the skew-split, not merely that the conf is on."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        # the conftest session uses 2 shuffle partitions (tiny state
        # tables); median-based skew detection needs enough partitions for
        # the hot one to stand out
        "spark.sql.shuffle.partitions": "8",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        fact = spark.range(220_000).select(
            F.when(F.col("id") < 200_000, F.lit(0))
            .otherwise((F.col("id") % 50) + 1)
            .alias("k"),
            F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(51).select(
            F.col("id").alias("k"),
            F.concat(F.lit("d"), F.col("id").cast("string")).alias("dv"),
        )
        j = fact.join(dim, "k").select(F.length("payload").alias("pl"), "dv")
        assert len(j.collect()) == 220_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_uncached_rollup_plans_no_catalyst_exchange(spark):
    """The status-rollup flagship's scale claim (operators/pipeline.py):
    with the derivation spread_by the order key and the rollup keyed on
    request_id, the UNCACHED plan contains no Catalyst-inserted exchange —
    every Exchange is an explicit spread_by repartition (or a broadcast),
    so on an orderkey-bucketed layout the query is shuffle-free."""
    from data_ingestion_api_system_spark.ingestion.core import (
        chunk_batches,
        ingestions_from_requests,
        requests_from_orders,
        simulate_progress,
        status_rollup,
        validate,
    )
    from data_ingestion_api_system_spark.operators import tune

    tune(spark)
    valid, _ = validate(requests_from_orders(spark, SF_DIR))
    rolled = status_rollup(
        ingestions_from_requests(valid),
        simulate_progress(chunk_batches(valid)),
        key="request_id",
    )
    plan = formatted_plan(rolled)
    assert "ENSURE_REQUIREMENTS" not in plan, plan
    assert "REPARTITION_BY_NUM" in plan  # the explicit spread_by exchanges
