"""Join-operator unit tests on constructed frames (the inventory queries
cover the oracle-checked end-to-end shapes; these pin edge semantics)."""

from pyspark.sql import Row

from spark_on_hbase_spark.operators import joins as J


def test_as_of_join_semantics(spark):
    right = spark.createDataFrame(
        [
            Row(k="a", ts=10, state="a10"),
            Row(k="a", ts=20, state="a20"),
            Row(k="b", ts=15, state="b15"),
        ]
    )
    left = spark.createDataFrame(
        [
            Row(k="a", ts=5, ev="early"),    # before any right row -> null
            Row(k="a", ts=10, ev="tie"),     # equal ts counts (<=)
            Row(k="a", ts=25, ev="late"),    # latest prior is a20, not a10
            Row(k="b", ts=30, ev="other"),   # keys do not bleed across
        ]
    )
    out = {
        (r["k"], r["ts"]): r["state"]
        for r in J.as_of_join(left, right, on="k").collect()
    }
    assert out == {
        ("a", 5): None,
        ("a", 10): "a10",
        ("a", 25): "a20",
        ("b", 30): "b15",
    }


def test_as_of_join_rejects_colliding_payload(spark):
    import pytest

    df = spark.createDataFrame([Row(k="a", ts=1, v=1)])
    with pytest.raises(ValueError, match="collide"):
        J.as_of_join(df, df, on="k")
