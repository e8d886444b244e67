"""Black-box HTTP tests mirroring the reference's Supertest style
(test/test_api.js:10-57) against the stdlib shim."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from data_ingestion_api_system_spark.streaming.drain import IngestionPipeline
from data_ingestion_api_system_spark.streaming.http_api import make_server


@pytest.fixture()
def server(spark, tmp_path):
    pipeline = IngestionPipeline(spark, str(tmp_path / "state"), durable=False)
    srv = make_server(pipeline)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(base: str, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        f"{base}/ingest",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(base: str, path: str) -> tuple[int, dict]:
    try:
        with urllib.request.urlopen(f"{base}{path}") as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_ingest_then_status_roundtrip(server):
    code, body = _post(server, {"ids": [1, 2, 3, 4, 5], "priority": "MEDIUM"})
    assert code == 200 and "ingestion_id" in body
    code, status = _get(server, f"/status/{body['ingestion_id']}")
    assert code == 200
    assert [b["ids"] for b in status["batches"]] == [[1, 2, 3], [4, 5]]


def test_invalid_body_400(server):
    assert _post(server, {"ids": [1, "a"], "priority": "HIGH"})[0] == 400
    assert _post(server, {"ids": [1], "priority": "URGENT"})[0] == 400
    assert _post(server, {"priority": "HIGH"})[0] == 400


def test_unknown_status_404(server):
    code, body = _get(server, "/status/does-not-exist")
    assert code == 404 and body == {"error": "Ingestion ID not found"}


def test_empty_ids_completed_immediately(server):
    _, body = _post(server, {"ids": [], "priority": "LOW"})
    code, status = _get(server, f"/status/{body['ingestion_id']}")
    assert code == 200 and status["status"] == "completed"
