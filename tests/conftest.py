import os

import pytest

# Heap must be sized at JVM-launch time (builder confs can't resize a live
# JVM); the test entry point owns the launch, so it sets it — mirroring
# bench.py. See the note in session.get_spark.
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS",
    f"--driver-memory {os.environ.get('SPARK_GRAFT_DRIVER_MEM', '24g')} pyspark-shell",
)

from spark_on_hbase_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
