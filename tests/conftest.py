import pytest

# Heap must be sized at JVM-launch time (builder confs can't resize a live
# JVM); the test entry point owns the launch, so it sets it — mirroring
# bench.py. See session.size_driver_heap_for_launch.
from spark_on_hbase_spark.session import get_spark, size_driver_heap_for_launch

size_driver_heap_for_launch()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
