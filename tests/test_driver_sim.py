"""Driver-contract simulation: the driver calls __spark_entry__ with ITS
OWN session (not our factory), so nothing may depend on get_spark()'s confs.
Every query must self-repair via operators.tune() — pinned here by starting
from a hostile (non-UTC) session timezone and checking a timestamp-bucketing
query against DuckDB."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema.fields) > 0


def test_registry_dicts_aligned():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 100


def test_window_query_survives_non_utc_session(spark):
    """Start from America/New_York (what a driver session could look like)
    and run the tumbling-window query: tune() must pin UTC so the window
    bucket counts match DuckDB's naive-timestamp arithmetic exactly."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = entrymod.queries()["events_tumbling_window"](spark, SF_DIR)
        got = df.agg({"n_events": "sum"}).collect()[0][0]
        n_rows = df.count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want_rows, want_events = con.execute(
        "SELECT count(*), sum(n) FROM (SELECT time_bucket(INTERVAL 5 MINUTE, ts) w,"
        " event_type, count(*) n FROM events GROUP BY 1, 2)"
    ).fetchone()
    assert n_rows == want_rows
    assert got == want_events
