"""Explicit schemas for the ingestion-pipeline data model.

Mirrors the reference's three in-memory stores (reference src/app.js:17-25)
as normalized tables (SURVEY.md §1.4):

- ``ingest_requests``: raw API inputs, pre-validation (src/app.js:106-116).
- ``ingestions``: parent records (src/app.js:141-146), children normalized
  out.
- ``batches``: child/work records (src/app.js:131-137) + the queue-entry
  fields (src/app.js:47-54); the "queue" is just the subset with
  ``status = 'yet_to_start'`` ordered at read time (SURVEY §1.4).
- ``processed_results``: per-ID simulated-call outputs (src/app.js:31) —
  the reference discards them; we persist them so processing is observable
  without wall-clock assertions.

IDs are LongType because the valid range is [1, 1_000_000_007]
(src/app.js:112) which exceeds Int32.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Priority enum (src/app.js:10-14): ordering levels HIGH=3 > MEDIUM=2 > LOW=1.
PRIORITY_LEVELS = {"HIGH": 3, "MEDIUM": 2, "LOW": 1}
VALID_PRIORITIES = tuple(PRIORITY_LEVELS)

# Valid ID range (src/app.js:112): 1 <= id <= 10^9 + 7.
MIN_ID = 1
MAX_ID = 1_000_000_007

# Max IDs per batch (src/app.js:123-124).
BATCH_SIZE = 3

# Status state machine (src/app.js:51,76,88): yet_to_start → triggered → completed.
STATUS_YET_TO_START = "yet_to_start"
STATUS_TRIGGERED = "triggered"
STATUS_COMPLETED = "completed"

INGEST_REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.LongType(), False),
        T.StructField("ids", T.ArrayType(T.LongType()), True),
        T.StructField("priority", T.StringType(), True),
        T.StructField("arrival_ts", T.TimestampType(), True),
    ]
)

INGESTIONS_SCHEMA = T.StructType(
    [
        T.StructField("ingestion_id", T.StringType(), False),
        T.StructField("priority", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

BATCHES_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("ingestion_id", T.StringType(), False),
        T.StructField("batch_seq", T.IntegerType(), False),
        T.StructField("ids", T.ArrayType(T.LongType()), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("priority", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

PROCESSED_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("data", T.StringType(), False),
    ]
)
