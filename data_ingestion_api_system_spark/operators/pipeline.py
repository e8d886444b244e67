"""Ingestion-dataflow queries (SURVEY.md §2 Part A re-expressed as
oracle-checkable batch queries over the driver's seeded tables).

The workload is derived deterministically from orders/lineitem
(FIXTURES.md §2): one ingest request per order, ids = the order's part keys
in line-number order, priority bucketed from o_orderpriority. That makes
every Part-A operator — validation (A2), chunking (A5), priority ordering
(A6), status rollup (A15-A17) — expressible as plain SQL for the DuckDB
oracle while the Spark side exercises the real transforms in
``ingestion.core``.

Arrays are compared as CSV strings (``array_join`` / ``string_agg``) so the
value-hash sees a scalar type both engines serialize identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingestion.core import (
    chunk_batches,
    ingestions_from_requests,
    priority_level,
    requests_from_orders,
    simulate_progress,
    status_rollup,
    validate,
)
from ..schemas import MAX_ID
from . import tune

# ---------------------------------------------------------------------------
# Shared DuckDB CTEs mirroring the deterministic workload derivation.
# ---------------------------------------------------------------------------

_SQL_REQUESTS = """
requests AS (
  SELECT o_orderkey AS request_id,
         concat('ing-', CAST(o_orderkey AS VARCHAR)) AS ingestion_id,
         CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2') THEN 'HIGH'
              WHEN substr(o_orderpriority, 1, 1) = '3' THEN 'MEDIUM'
              ELSE 'LOW' END AS priority,
         o_orderdate AS arrival_ts
  FROM orders
)"""

_SQL_BATCHES = """
li AS (
  SELECT l_orderkey, l_partkey + 1 AS id,
         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) - 1 AS rn
  FROM lineitem
),
batches AS (
  SELECT concat('ing-', CAST(l_orderkey AS VARCHAR)) AS ingestion_id,
         l_orderkey AS request_id,
         CAST(rn // 3 AS INT) AS batch_seq,
         string_agg(CAST(id AS VARCHAR), ',' ORDER BY rn) AS ids_csv,
         count(*) AS n_ids
  FROM li
  GROUP BY l_orderkey, rn // 3
),
batches_status AS (
  SELECT *,
         concat('b-', CAST(request_id AS VARCHAR), '-', CAST(batch_seq AS VARCHAR)) AS batch_id,
         CASE WHEN (request_id + batch_seq) % 5 < 2 THEN 'completed'
              WHEN (request_id + batch_seq) % 5 = 2 THEN 'triggered'
              ELSE 'yet_to_start' END AS status
  FROM batches
)"""


# ---------------------------------------------------------------------------
# A2 — validation filter
# ---------------------------------------------------------------------------

def q_pipeline_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (src/app.js:110-116): run the real forall-range + enum-membership
    predicate over a workload spiked with invalid rows (priority
    'NOT_SPECIFIED' from '4-*' orders; an out-of-range id 10^9+8 appended
    when request_id % 101 == 0), and report accept/reject counts.

    Scale: a pure narrow filter — no shuffle until the final tiny count
    aggregate; the predicate evaluates inside whole-stage codegen.
    """
    tune(spark)
    base = requests_from_orders(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    raw = (
        base.join(orders, base.request_id == orders.o_orderkey)
        .select(
            "request_id",
            F.when(
                F.col("request_id") % 101 == 0,
                F.concat("ids", F.array(F.lit(MAX_ID + 1).cast("bigint"))),
            )
            .otherwise(F.col("ids"))
            .alias("ids"),
            F.when(F.substring("o_orderpriority", 1, 1) == "4", "NOT_SPECIFIED")
            .otherwise(F.col("priority"))
            .alias("priority"),
            "arrival_ts",
        )
    )
    valid, rejected = validate(raw)
    accepted = valid.groupBy("priority").agg(
        F.count("*").alias("n_requests"), F.sum(F.size("ids")).alias("n_ids")
    ).withColumn("outcome", F.lit("accepted"))
    refused = rejected.groupBy("priority").agg(
        F.count("*").alias("n_requests"), F.sum(F.size("ids")).alias("n_ids")
    ).withColumn("outcome", F.lit("rejected"))
    return accepted.unionByName(refused).select(
        "outcome", "priority", "n_requests", F.col("n_ids").cast("bigint").alias("n_ids")
    )


_ORACLE_VALIDATE = f"""
WITH {_SQL_REQUESTS},
ids_per AS (
  SELECT l_orderkey, count(*) AS n_ids FROM lineitem GROUP BY l_orderkey
),
raw AS (
  SELECT r.request_id,
         coalesce(i.n_ids, 0) + CASE WHEN r.request_id % 101 = 0 THEN 1 ELSE 0 END AS n_ids,
         CASE WHEN substr(o.o_orderpriority, 1, 1) = '4' THEN 'NOT_SPECIFIED'
              ELSE r.priority END AS priority,
         (r.request_id % 101 <> 0)
           AND (CASE WHEN substr(o.o_orderpriority, 1, 1) = '4' THEN 'NOT_SPECIFIED'
                     ELSE r.priority END) IN ('HIGH', 'MEDIUM', 'LOW') AS is_valid
  FROM requests r
  JOIN orders o ON o.o_orderkey = r.request_id
  LEFT JOIN ids_per i ON i.l_orderkey = r.request_id
)
SELECT CASE WHEN is_valid THEN 'accepted' ELSE 'rejected' END AS outcome,
       priority,
       count(*) AS n_requests,
       CAST(sum(n_ids) AS BIGINT) AS n_ids
FROM raw
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# A5 — batch chunking
# ---------------------------------------------------------------------------

def q_pipeline_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (src/app.js:122-138): ids → consecutive ≤3-element batches via
    transform(sequence)+slice+posexplode — all JVM array expressions, no
    UDF, no shuffle beyond the workload derivation itself."""
    tune(spark)
    valid, _ = validate(requests_from_orders(spark, sf_dir))
    b = chunk_batches(valid.filter(F.size("ids") > 0))
    return b.select(
        "batch_id",
        "ingestion_id",
        "batch_seq",
        F.array_join("ids", ",").alias("ids_csv"),
        F.size("ids").cast("bigint").alias("n_ids"),
    )


_ORACLE_CHUNK = f"""
WITH {_SQL_BATCHES}
SELECT batch_id, ingestion_id, batch_seq, ids_csv, CAST(n_ids AS BIGINT) AS n_ids
FROM batches_status
"""


# ---------------------------------------------------------------------------
# A6 — priority queue order
# ---------------------------------------------------------------------------

def q_pipeline_queue_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (src/app.js:36-42,57): the queue's total dequeue order — priority
    level DESC, created_at ASC, (request_id, batch_seq) ASC — materialized
    as a rank over the pending set, top 100.

    Scale: rank-over-everything is a single-partition window; for the
    top-100 report Spark runs TakeOrderedAndProject (per-partition heaps,
    driver merge) because the window is applied after orderBy().limit() —
    the full sort never materializes. The drain loop itself only ever takes
    top-1 per trigger (streaming/drain.py).
    """
    tune(spark)
    valid, _ = validate(requests_from_orders(spark, sf_dir))
    b = simulate_progress(chunk_batches(valid.filter(F.size("ids") > 0)))
    pending = b.filter(F.col("status") == "yet_to_start").withColumn(
        "priority_level", priority_level("priority")
    )
    top = pending.orderBy(
        F.desc("priority_level"),
        F.asc("created_at"),
        F.asc("request_id"),
        F.asc("batch_seq"),
    ).limit(100)
    # rank within the already-tiny top-100 set (cheap single partition)
    from pyspark.sql import Window

    w = Window.orderBy(
        F.desc("priority_level"),
        F.asc("created_at"),
        F.asc("request_id"),
        F.asc("batch_seq"),
    )
    return top.select(
        F.row_number().over(w).alias("queue_rank"),
        "batch_id",
        "priority",
        "priority_level",
        "request_id",
        "batch_seq",
    )


_ORACLE_QUEUE_ORDER = f"""
WITH {_SQL_REQUESTS},
{_SQL_BATCHES.lstrip()},
pending AS (
  SELECT b.*, r.priority, r.arrival_ts,
         CASE r.priority WHEN 'HIGH' THEN 3 WHEN 'MEDIUM' THEN 2 ELSE 1 END AS priority_level
  FROM batches_status b
  JOIN requests r USING (request_id)
  WHERE b.status = 'yet_to_start'
)
SELECT CAST(row_number() OVER (ORDER BY priority_level DESC, arrival_ts ASC,
                               request_id ASC, batch_seq ASC) AS INT) AS queue_rank,
       batch_id, priority, priority_level, request_id, batch_seq
FROM pending
ORDER BY queue_rank
LIMIT 100
"""


# ---------------------------------------------------------------------------
# A15-A17 — status rollup (the flagship)
# ---------------------------------------------------------------------------

def q_pipeline_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15+A16 (src/app.js:166-173): per-ingestion overall status over a
    deterministic partial-progress snapshot, including the vacuous-completed
    edge (zero-batch ingestions report 'completed', src/app.js:169).

    Plan shape (the headline-bench flagship): the workload derivation
    arrives hash-partitioned on the order key (spread_by inside
    requests_from_orders), and the rollup groups/joins on ``request_id``
    — the numeric key partitioning carries through the chunk explode,
    which it cannot for the concat-derived ``ingestion_id`` string;
    ``ingestion_id`` is projected from the parent side. Uncached, the
    whole query plans zero Catalyst-inserted exchanges (only the
    spread_by repartitions + broadcasts — verified via explain), i.e. at
    100 TB with both tables bucketed by orderkey it is shuffle-free.

    The validated request set feeds BOTH rollup inputs (parents and
    children), so the collect_list derivation computes twice — and that is
    STILL faster than caching it: under the keyed-spread layout the
    derivation is a single exchange, while a cache must serialize the
    array-heavy rows into storage and hides the child partitioning from
    the batches-side aggregate (one ENSURE_REQUIREMENTS exchange
    re-appears). A/B at sf0.1, 5 reps with clearCache between (r6):
    uncached 2.41/1.87/1.68/1.58/1.50 s vs cached 12.9/4.04/2.06/1.99/
    1.94 s — uncached wins cold AND steady-state. (Before the keyed
    spread the cache won: r5 measured cached 1.46 s vs uncached 1.71 s —
    layout changes flip this tradeoff, so re-measure after touching the
    derivation.) On a bucketed production layout the plan is shuffle-free
    either way.
    """
    tune(spark)
    valid, _ = validate(requests_from_orders(spark, sf_dir))
    ing = ingestions_from_requests(valid)
    b = simulate_progress(chunk_batches(valid))
    return status_rollup(ing, b, key="request_id")


_ORACLE_STATUS_ROLLUP = f"""
WITH {_SQL_REQUESTS},
{_SQL_BATCHES.lstrip()},
rolled AS (
  SELECT ingestion_id,
         bool_and(status = 'completed') AS all_completed,
         bool_or(status = 'triggered') AS any_triggered,
         count(*) AS n_batches,
         sum(n_ids) AS n_ids
  FROM batches_status
  GROUP BY ingestion_id
)
SELECT r.ingestion_id, r.priority,
       CASE WHEN coalesce(b.all_completed, TRUE) THEN 'completed'
            WHEN coalesce(b.any_triggered, FALSE) THEN 'triggered'
            ELSE 'yet_to_start' END AS status,
       CAST(coalesce(b.n_batches, 0) AS BIGINT) AS n_batches,
       CAST(coalesce(b.n_ids, 0) AS BIGINT) AS n_ids
FROM requests r
LEFT JOIN rolled b USING (ingestion_id)
"""


def q_pipeline_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 aggregated: ingestion counts by (overall status, priority) — the
    monitoring view of the pipeline."""
    tune(spark)
    return (
        q_pipeline_status_rollup(spark, sf_dir)
        .groupBy("status", "priority")
        .agg(F.count("*").alias("n_ingestions"), F.sum("n_ids").alias("n_ids"))
    )


_ORACLE_STATUS_COUNTS = f"""
WITH base AS ({_ORACLE_STATUS_ROLLUP})
SELECT status, priority, count(*) AS n_ingestions, CAST(sum(n_ids) AS BIGINT) AS n_ids
FROM base
GROUP BY 1, 2
"""


QUERIES = {
    "pipeline_validate": q_pipeline_validate,
    "pipeline_chunk": q_pipeline_chunk,
    "pipeline_queue_order": q_pipeline_queue_order,
    "pipeline_status_rollup": q_pipeline_status_rollup,
    "pipeline_status_counts": q_pipeline_status_counts,
}

ORACLE = {
    "pipeline_validate": _ORACLE_VALIDATE,
    "pipeline_chunk": _ORACLE_CHUNK,
    "pipeline_queue_order": _ORACLE_QUEUE_ORDER,
    "pipeline_status_rollup": _ORACLE_STATUS_ROLLUP,
    "pipeline_status_counts": _ORACLE_STATUS_COUNTS,
}
