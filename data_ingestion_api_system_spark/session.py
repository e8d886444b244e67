"""SparkSession factory.

Tuned for the harness (local[32], single JVM, 128 GiB) but every setting is
chosen to also be the right default on a real multi-executor cluster at
~100 TB scale:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting, and
  dynamic broadcast conversion replace hand-tuned partition counts when data
  volume changes by orders of magnitude.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE coalesces
  down for small inputs and the 100 TB deployment would raise it (rule of
  thumb: ~2-3x total cores, with AQE target size ~64-128 MB per partition).
- Arrow enabled: every Pandas-UDF path (similarity, multimodal stubs) moves
  data in columnar batches rather than pickled rows.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_ingestion_api_system_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``shuffle_partitions`` defaults to $SPARK_GRAFT_CPUS (or 32). On a
    1000-executor cluster this should be sized so a post-shuffle partition is
    ~64-128 MB; AQE's ``coalescePartitions`` makes the initial value a ceiling
    rather than an exact choice, so erring high is safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
