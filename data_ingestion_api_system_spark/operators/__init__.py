"""Query capability layer (SURVEY.md §2 Part C + BASELINE.json north star).

Each module exposes two dicts:
- ``QUERIES``: name → callable(spark, sf_dir) → DataFrame
- ``ORACLE``:  name → equivalent DuckDB SQL (omitted for ops that are not
  SQL-expressible; the driver then records a rows-only check)

``__spark_entry__.py`` aggregates them all.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def tune(spark: SparkSession) -> SparkSession:
    """Runtime confs every query needs regardless of who built the session:
    UTC so timestamp semantics match the DuckDB oracle; AQE on so small-SF
    runs coalesce their shuffles and large-SF runs split skew."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    return spark


def collect_queries() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Aggregate QUERIES/ORACLE across all operator modules."""
    from . import (
        dedup,
        events,
        multimodal,
        pipeline,
        relational,
        relational2,
        relational3,
        similarity,
        text,
        windows,
    )

    from ..streaming import jobs as streaming_jobs

    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for mod in (
        pipeline,
        relational,
        relational2,
        relational3,
        windows,
        events,
        text,
        dedup,
        similarity,
        multimodal,
        streaming_jobs,
    ):
        queries.update(mod.QUERIES)
        oracle.update(mod.ORACLE)
    return queries, oracle
