"""Loader-drift regression: the driver's events.parquet has shipped ``ts``
as TIMESTAMP(NANOS) (round 1-3 testdata) and as plain timestamp[us]
(round 4+). ``load_table`` must yield identical instants for both — the
environment changed once; it can change again."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_ingestion_api_system_spark.tables import load_table
from data_ingestion_api_system_spark.streaming.jobs import _ts_is_raw_nanos

_INSTANTS_US = [
    1704067200_000000,  # 2024-01-01T00:00:00
    1704067200_123456,  # sub-second precision survives
    1706738776_220708,
]


def _write_events(path, ts_array):
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(_INSTANTS_US)), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([1] * len(_INSTANTS_US), pa.int64()),
            "event_type": pa.array(["click"] * len(_INSTANTS_US)),
            "value": pa.array([1.0] * len(_INSTANTS_US)),
            "props": pa.array(["{}"] * len(_INSTANTS_US)),
        }
    )
    pq.write_table(tbl, path)


@pytest.fixture(scope="module")
def encodings(tmp_path_factory):
    """Two sf-dir fixtures with the same instants in each ts encoding."""
    us_dir = tmp_path_factory.mktemp("sf_us")
    ns_dir = tmp_path_factory.mktemp("sf_ns")
    _write_events(
        us_dir / "events.parquet",
        pa.array(_INSTANTS_US, pa.timestamp("us")),
    )
    _write_events(
        ns_dir / "events.parquet",
        pa.array([v * 1000 for v in _INSTANTS_US], pa.timestamp("ns")),
    )
    return str(us_dir), str(ns_dir)


def test_footer_probe(spark, encodings):
    us_dir, ns_dir = encodings
    assert _ts_is_raw_nanos(spark, us_dir) is False
    # NANOS: either the read fails (legacy conf unset) or, if a previous
    # loader already set nanosAsLong, resolves to LongType — True both ways
    assert _ts_is_raw_nanos(spark, ns_dir) is True


def test_both_encodings_same_instants(spark, encodings):
    us_dir, ns_dir = encodings
    got = {}
    for label, d in (("us", us_dir), ("ns", ns_dir)):
        df = load_table(spark, d, "events")
        assert [f.name for f in df.schema.fields] == [
            "event_id", "ts", "user_id", "event_type", "value", "props",
        ]
        assert df.schema["ts"].dataType.typeName() == "timestamp"
        got[label] = sorted(
            (r.event_id, r.ts) for r in df.select("event_id", "ts").collect()
        )
    assert got["us"] == got["ns"]
    # and the absolute wall clocks are the ones we wrote
    assert got["us"][0][1] == dt.datetime(2024, 1, 1, 0, 0, 0)
    assert got["us"][1][1] == dt.datetime(2024, 1, 1, 0, 0, 0, 123456)


def test_current_testdata_loads(spark):
    """Whatever encoding the live testdata uses, the loader must read it."""
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.count() > 0
