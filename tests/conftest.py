from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from data_ingestion_api_system_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # tiny state tables: minimal shuffle width keeps per-job overhead low
    spark = get_spark("tests", shuffle_partitions=2)
    yield spark
    from data_ingestion_api_system_spark.operators import release_pins

    release_pins()
    spark.stop()
