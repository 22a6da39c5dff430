from __future__ import annotations

import os
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from redis_streams_spark.session import TABLES, get_spark  # noqa: E402
from redis_streams_spark.streaming.stateful import ensure_protobuf  # noqa: E402

# Must run BEFORE any SparkSession: transformWithStateInPandas workers
# need google.protobuf, and they inherit PYTHONPATH/env from the JVM at
# launch.  Discovers the gcloud-bundled pure-Python runtime when no
# protobuf wheel exists (returns False harmlessly when neither does).
ensure_protobuf()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pytest", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
