"""File-format connectors (SURVEY §2 Part C sources/sinks): parquet is the
system of record; CSV/JSON/ORC are interchange formats with explicit
schemas (never inferSchema in production — a schema-inference pass is a
full extra read of the data).

Scale notes:
- Writers take a ``partition_by`` so large outputs lay down
  partition-pruned directory trees (e.g. events by day): readers then skip
  whole directories on time-range predicates.
- JSON/CSV are row formats — no column pruning, no predicate pushdown, no
  statistics. The helpers exist for ingest/export edges; anything queried
  repeatedly should be converted to parquet (``convert_to_parquet``).
- JDBC/Kafka connectors: the builder methods are provided but require
  their driver jars on the classpath, which this container lacks — they
  raise a clear error rather than failing deep inside Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "parquet":
        writer.parquet(path)
    elif fmt == "xml":
        # Spark 4 native XML (no external package); rowTag is mandatory
        writer.option("rootTag", "rows").option("rowTag", "row").format(
            "xml"
        ).save(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """``options`` passes reader options through — e.g.
    ``{"mergeSchema": "true"}`` for parquet schema evolution (readers see
    the union schema across files; columns absent in older files read as
    null). Merge is a footer-only operation, but at 100 TB prefer a
    declared union schema over per-query footer merging."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    # format defaults first, caller options after — so options can
    # override the csv/xml defaults rather than being clobbered by them
    if fmt == "csv":
        reader = reader.option("header", "true")
    if fmt == "xml":
        reader = reader.option("rowTag", "row")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if fmt == "csv":
        return reader.csv(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "xml":
        return reader.format("xml").load(path)
    raise ValueError(f"unsupported format {fmt!r}")


def convert_to_parquet(
    spark: SparkSession,
    src_path: str,
    src_fmt: str,
    dest_path: str,
    schema: T.StructType | str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Ingest-edge conversion: row format in, parquet out (the first thing
    a 100 TB pipeline does to interchange data)."""
    write_table(
        read_table(spark, src_path, src_fmt, schema),
        dest_path,
        "parquet",
        partition_by=partition_by,
    )


def kafka_stream_source(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """Kafka streaming source for the ingest pipeline (BASELINE.json
    'REST/Kafka sources'). Requires the spark-sql-kafka package on the
    classpath — not present in this container, so fail fast with context.
    """
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .load()
        )
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka connector jars "
            "(org.apache.spark:spark-sql-kafka-0-10) on the classpath"
        ) from e


def jdbc_table(
    spark: SparkSession, url: str, table: str, properties: dict[str, str] | None = None
) -> DataFrame:
    """JDBC reader — requires the database's JDBC driver jar (absent in
    this container); partition options (partitionColumn/numPartitions)
    should always be set for large tables so the read parallelizes."""
    try:
        return spark.read.jdbc(url, table, properties=properties or {})
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "JDBC source requires the database driver jar on the classpath"
        ) from e
