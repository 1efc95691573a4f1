from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Activate the vendored google.protobuf fallback (no-op when the real
# package is installed) BEFORE any SparkSession exists: the stateful
# Python protocol runs in Spark's worker processes, which inherit
# PYTHONPATH from the session's environment at start time.
from datagouvfr_data_pipelines_spark.vendor import ensure_protobuf  # noqa: E402

PROTOBUF_MODE = ensure_protobuf()

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from datagouvfr_data_pipelines_spark.session import get_spark

    s = get_spark(app_name="engine-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
