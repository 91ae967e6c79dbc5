"""Shared test fixtures: one SparkSession per test run, sf0.001/sf0.01 paths."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mtg_vector_db_spark.session import get_spark  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"

# Fast lane (round 9, round-8 VERDICT #8): the full suite (858 tests)
# runs the streaming session/crash-replay harnesses and the 255-case
# fuzz-parity sweep — tens of minutes of wall clock that a bounded CI
# budget can time out on (round 8's driver VERIFY recorded a dot-tail
# timeout). SPARK_GRAFT_SMOKE=1 skips exactly those three heavyweight
# files — every test stays collected and no test is deleted; the full
# suite remains the default (`pytest tests/ -x -q`).
_SMOKE_SKIP_FILES = {
    "test_asof_sessions.py",   # streaming session folds (~25 s/test)
    "test_crash_replay.py",    # kill+replay every streaming maintainer
    "test_fuzz_parity.py",     # 255 randomized cross-engine parity cases
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_SMOKE") != "1":
        return
    skip = pytest.mark.skip(
        reason="SPARK_GRAFT_SMOKE=1 fast lane: heavyweight streaming/"
        "fuzz files skipped (run without the env for the full suite)"
    )
    for item in items:
        if os.path.basename(str(item.fspath)) in _SMOKE_SKIP_FILES:
            item.add_marker(skip)


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
