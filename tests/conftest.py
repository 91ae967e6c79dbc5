"""Shared test fixtures: one SparkSession per test run, sf0.001/sf0.01 paths."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mtg_vector_db_spark.session import get_spark  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session", autouse=True)
def _isolated_artifact_root(tmp_path_factory):
    """Point the index-artifact store (operators/artifacts.py) at a
    per-session temp dir: tests and fuzz corpora must never write into
    the repo's committed artifacts/ directory."""
    prev = os.environ.get("SPARK_GRAFT_ARTIFACTS")
    os.environ["SPARK_GRAFT_ARTIFACTS"] = str(
        tmp_path_factory.mktemp("artifacts")
    )
    yield
    if prev is None:
        os.environ.pop("SPARK_GRAFT_ARTIFACTS", None)
    else:
        os.environ["SPARK_GRAFT_ARTIFACTS"] = prev


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mtg-vector-db-spark-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf0001():
    return SF0001


@pytest.fixture(scope="session")
def sf001():
    return SF001
