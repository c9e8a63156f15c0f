"""Scan-operator unit tests: deterministic sampling stability (the property
that distinguishes it from RNG sampling under task retries), time-range
boundary semantics, select_required edge cases, consistency no-op."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators import scan as S


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame([Row(id=f"row-{i}") for i in range(2000)])


def test_sample_invariant_under_partitioning(ids):
    """Same rows kept no matter how the data is partitioned — RNG-based
    sampling loses this under task retry/re-partitioning at scale."""
    a = {r["id"] for r in S.sample_deterministic(ids, "id", 0.1).collect()}
    b = {
        r["id"]
        for r in S.sample_deterministic(ids.repartition(13), "id", 0.1).collect()
    }
    assert a == b
    assert 100 < len(a) < 300  # ~10% of 2000


def test_sample_fraction_monotone(ids):
    """A row kept at fraction f is kept at every f' > f (nested samples)."""
    small = {r["id"] for r in S.sample_deterministic(ids, "id", 0.05).collect()}
    big = {r["id"] for r in S.sample_deterministic(ids, "id", 0.2).collect()}
    assert small <= big


def test_time_range_half_open(spark):
    df = spark.createDataFrame(
        [Row(ts=t, v=i) for i, t in enumerate(["2024-01-01", "2024-01-05", "2024-01-10"])]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = S.time_range(df, "ts", "2024-01-01", "2024-01-10").collect()
    assert {r["v"] for r in out} == {0, 1}  # min inclusive, max exclusive


def test_select_required_plain_vs_qualified(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=2, b="x")], "a int, b string"
    )
    assert S.select_required(df, "a", "b").count() == 2     # plain: no drop
    assert S.select_required(df, "a", "b!").count() == 1    # qualified: drop null


def test_ttl_filter(spark):
    df = spark.createDataFrame(
        [Row(ts="2024-01-01 00:00:00", v=0), Row(ts="2024-01-08 00:00:00", v=1)]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = S.ttl_filter(df, "ts", "2024-01-10 00:00:00", ttl_seconds=5 * 86400)
    assert [r["v"] for r in out.collect()] == [1]  # 9-day-old row expired


def test_consistency_noop(spark):
    df = spark.createDataFrame([Row(a=1)])
    assert S.consistency(df, "STRONG") is df
    assert S.consistency(df, "TIMELINE") is df
    with pytest.raises(ValueError):
        S.consistency(df, "EVENTUAL")
