"""Join-operator unit tests on constructed frames (the inventory queries
cover the oracle-checked end-to-end shapes; these pin edge semantics)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

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


def test_range_join_bins_and_boundaries(spark):
    from datetime import datetime as dt

    right = spark.createDataFrame(
        [
            # spans two 600s bins
            Row(iv="w1", s=dt(2024, 1, 1, 0, 5), e=dt(2024, 1, 1, 0, 15)),
            Row(iv="w2", s=dt(2024, 1, 1, 1, 0), e=dt(2024, 1, 1, 1, 10)),
            Row(iv="empty", s=dt(2024, 1, 1, 2, 0), e=dt(2024, 1, 1, 2, 0)),
        ]
    )
    left = spark.createDataFrame(
        [
            Row(ev="in_w1_bin1", ts=dt(2024, 1, 1, 0, 6)),
            Row(ev="in_w1_bin2", ts=dt(2024, 1, 1, 0, 12)),
            Row(ev="at_start", ts=dt(2024, 1, 1, 1, 0)),    # inclusive
            Row(ev="at_end", ts=dt(2024, 1, 1, 0, 15)),     # exclusive
            Row(ev="outside", ts=dt(2024, 1, 1, 3, 0)),
        ]
    )
    out = J.range_join(left, right, "ts", "s", "e", bin_seconds=600)
    pairs = {(r["ev"], r["iv"]) for r in out.collect()}
    assert pairs == {("in_w1_bin1", "w1"), ("in_w1_bin2", "w1"), ("at_start", "w2")}


def test_as_of_join_matches_pandas_merge_asof(spark):
    """Randomized (seeded) differential test: Spark as_of_join vs pandas
    merge_asof — an independent reference implementation of backward as-of
    semantics — over hundreds of keys with colliding timestamps."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n_r, n_l = 400, 600
    right_pd = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 50, n_r),
                "ts": rng.integers(0, 1000, n_r),
                "state": np.arange(n_r),
            }
        )
        .drop_duplicates(["k", "ts"])  # operator contract: unique (key, ts)
        .reset_index(drop=True)
    )
    left_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 60, n_l),  # some keys have no right rows
            "ts": rng.integers(0, 1000, n_l),
            "ev": np.arange(n_l),
        }
    )

    expected = pd.merge_asof(
        left_pd.sort_values(["ts", "ev"]).reset_index(drop=True),
        right_pd.sort_values("ts").reset_index(drop=True),
        on="ts",
        by="k",
        direction="backward",
    )
    exp = {
        (int(r.k), int(r.ts), int(r.ev)): (None if pd.isna(r.state) else int(r.state))
        for r in expected.itertuples()
    }

    got_rows = J.as_of_join(
        spark.createDataFrame(left_pd), spark.createDataFrame(right_pd), on="k"
    ).collect()
    got = {
        (r["k"], r["ts"], r["ev"]): r["state"] for r in got_rows
    }
    assert len(got) == len(exp)
    assert got == exp


def test_range_join_matches_naive_cross_filter(spark):
    """Seeded differential test: bin-bucketed range_join vs the naive
    cross-join + inequality filter it replaces, with intervals of varied
    lengths (shorter and longer than the bin) and open/empty edge cases."""
    from datetime import datetime as dt, timedelta as td
    import numpy as np

    rng = np.random.default_rng(7)
    base = dt(2024, 1, 1)
    right_rows = []
    for i in range(80):
        s = base + td(minutes=int(rng.integers(0, 5000)))
        length = int(rng.integers(0, 90))  # 0 => empty interval
        right_rows.append(Row(iv=i, s=s, e=s + td(minutes=length)))
    left_rows = [
        Row(ev=j, ts=base + td(minutes=int(rng.integers(0, 5000))))
        for j in range(300)
    ]
    right = spark.createDataFrame(right_rows)
    left = spark.createDataFrame(left_rows)

    naive = (
        left.crossJoin(right)
        .where((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .select("ev", "iv")
    )
    expected = {(r["ev"], r["iv"]) for r in naive.collect()}
    got = {
        (r["ev"], r["iv"])
        for r in J.range_join(left, right, "ts", "s", "e", bin_seconds=1800).collect()
    }
    assert got == expected and len(expected) > 0


def test_salted_join_matches_plain_join(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    # heavy skew: 70% of big-side rows share one key
    keys = np.where(rng.random(2000) < 0.7, 1, rng.integers(0, 40, 2000))
    big = spark.createDataFrame(
        [Row(k=int(k), ev=i) for i, k in enumerate(keys)]
    )
    small = spark.createDataFrame([Row(k=i, dim=f"d{i}") for i in range(40)])

    plain = {(r["k"], r["ev"], r["dim"]) for r in big.join(small, "k").collect()}
    salted = {
        (r["k"], r["ev"], r["dim"])
        for r in J.salted_join(big, small, "k", salt_buckets=8, salt_source="ev").collect()
    }
    assert salted == plain and len(plain) > 0


def test_as_of_join_survives_celebrity_key_skew(spark):
    """SCALE.md claim made literal (round-1 verdict item 10): a celebrity
    key concentrates all its rows into ONE window partition; the running
    ``last`` must stream under a bounded in-memory buffer (WindowExec spills
    past the threshold) instead of OOMing the task. 150k rows on a single
    key with the window buffer capped to 1k rows => the operator is forced
    through the spill path and must still produce exact as-of semantics."""
    n_left, n_right = 100_000, 50_000
    left = spark.range(n_left).select(
        F.lit(1).alias("user_id"), (F.col("id") * 7 % 499_979).alias("ts")
    )
    right = spark.range(n_right).select(
        F.lit(1).alias("user_id"), (F.col("id") * 10).alias("ts"),
        F.col("id").alias("state"),
    )
    prev_mem = spark.conf.get("spark.sql.windowExec.buffer.in.memory.threshold", None)
    prev_spill = spark.conf.get("spark.sql.windowExec.buffer.spill.threshold", None)
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "1024")
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "8192")
    try:
        out = J.as_of_join(left, right, on="user_id", left_ts="ts", right_ts="ts")
        from spark_on_hbase_spark import plans

        assert plans.count_shuffles(out) == 1  # one hash partition, no self-join
        # exact closed form: right states live at ts = 10*state, so the
        # as-of match for probe time t is state = min(floor(t/10), n_right-1)
        expected = F.least(F.floor(F.col("ts") / 10), F.lit(n_right - 1))
        assert out.where(F.col("state") != expected).count() == 0
        assert out.count() == n_left
    finally:
        for key, prev in [
            ("spark.sql.windowExec.buffer.in.memory.threshold", prev_mem),
            ("spark.sql.windowExec.buffer.spill.threshold", prev_spill),
        ]:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)


def test_funnel_strict_ordering_and_conversion(spark):
    from datetime import datetime

    from spark_on_hbase_spark.operators import agg as A

    def ev(u, t, typ):
        return (u, datetime(2024, 1, 1, 0, 0, t), typ)

    rows = [
        # u1 completes the funnel in order
        ev("u1", 1, "a"), ev("u1", 2, "b"), ev("u1", 3, "c"),
        # u2 has b BEFORE a: the early b must not count, and no b after a
        ev("u2", 1, "b"), ev("u2", 2, "a"),
        # u3 reaches b but its c is BEFORE b
        ev("u3", 1, "c"), ev("u3", 2, "a"), ev("u3", 3, "b"),
        # u4 never does a
        ev("u4", 1, "b"), ev("u4", 2, "c"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["step"]: r for r in A.funnel(df, ["a", "b", "c"]).collect()}
    assert out["a"]["n_users"] == 3          # u1 u2 u3
    assert out["b"]["n_users"] == 2          # u1 u3 (u2's b precedes its a)
    assert out["c"]["n_users"] == 1          # u1 only
    assert out["a"]["conversion"] == 1.0
    assert abs(out["b"]["conversion"] - 2 / 3) < 1e-12
    assert out["c"]["conversion"] == 0.5


def test_cohort_retention_periods_and_rates(spark):
    from datetime import datetime

    from spark_on_hbase_spark.operators import agg as A

    rows = [
        # cohort day 1: u1 active weeks 0 and 1; u2 only week 0
        ("u1", datetime(2024, 1, 1, 9)), ("u1", datetime(2024, 1, 9, 9)),
        ("u2", datetime(2024, 1, 1, 12)),
        # cohort day 2: u3 active week 0, then day 16 -> period 2
        ("u3", datetime(2024, 1, 2, 9)), ("u3", datetime(2024, 1, 18, 9)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (str(r["cohort_day"]), r["period"]): (r["n_active"], r["retention"])
        for r in A.cohort_retention(df).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-02", 0)] == (1, 1.0)
    assert got[("2024-01-02", 2)] == (1, 1.0)
    assert ("2024-01-02", 1) not in got


def test_daily_volume_anomaly_matches_numpy(spark):
    from datetime import datetime

    import numpy as np

    from spark_on_hbase_spark.operators import agg as A

    # type 'a': counts [3, 1, 2] over 3 days; type 'b': one day only -> z=0
    rows = []
    for day, n in [(1, 3), (2, 1), (3, 2)]:
        rows += [("a", datetime(2024, 1, day, 10, m)) for m in range(n)]
    rows += [("b", datetime(2024, 1, 1, 8))]
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    got = {
        (r["event_type"], str(r["day"])): (r["n_events"], r["z"])
        for r in A.daily_volume_anomaly(df).collect()
    }
    counts = np.array([3.0, 1.0, 2.0])
    expect = (counts - counts.mean()) / counts.std(ddof=1)
    for day, e in zip(["2024-01-01", "2024-01-02", "2024-01-03"], expect):
        n, z = got[("a", day)]
        assert abs(z - e) < 1e-12, (day, z, e)
    assert got[("b", "2024-01-01")] == (1, 0.0)  # single day: z defined 0
