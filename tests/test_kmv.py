"""KMV / theta sketches (operators/sketch.py): the sketch must match a
pure-Python md5 replay bit-for-bit, the not-full degenerate cases must be
EXACT, and the estimators must land within the theory envelope on planted
overlaps."""

import hashlib

from pyspark.sql import functions as F

from spark_on_hbase_spark.operators import sketch as SK

K = 32


def _h(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:13], 16)


def _ref_sketch(keys, k=K):
    hs = sorted({_h(x) for x in keys})[:k]
    return hs


def _mk(spark, groups: dict):
    rows = [(g, x) for g, xs in groups.items() for x in xs]
    return spark.createDataFrame(rows, "g string, user_id bigint")


def test_sketch_matches_python_md5_replay(spark):
    groups = {"a": range(500), "b": range(400, 900)}
    df = _mk(spark, groups)
    got = {
        (r.g, r.rk): r.h
        for r in SK.kmv_build(df, "user_id", ["g"], k=K).collect()
    }
    for g, xs in groups.items():
        want = _ref_sketch(xs)
        for i, h in enumerate(want, 1):
            assert got[(g, i)] == h
    assert len(got) == 2 * K


def test_distinct_estimate_exact_when_not_full_and_close_when_full(spark):
    groups = {"small": range(10), "big": range(5000)}
    df = _mk(spark, groups)
    sk = SK.kmv_build(df, "user_id", ["g"], k=K)
    est = {
        r.g: r.distinct_est
        for r in SK.kmv_distinct_estimate(sk, ["g"], k=K).collect()
    }
    assert est["small"] == 10  # not full => the sketch IS the key set
    assert 0.6 * 5000 <= est["big"] <= 1.6 * 5000  # ~1/sqrt(k-1) envelope


def test_intersection_estimate_exact_when_not_full(spark):
    groups = {"a": range(20), "b": range(10, 25)}
    df = _mk(spark, groups)
    sk = SK.kmv_build(df, "user_id", ["g"], k=K)
    got = SK.kmv_intersect_pairs(sk, "g", k=K).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.group_a, r.group_b) == ("a", "b")
    # both not-full => theta = U and the estimate IS the exact overlap
    assert r.shared_below_theta == 10 and r.intersect_est == 10


def test_intersection_estimate_close_on_planted_overlap(spark):
    big = 4000
    groups = {"a": range(big), "b": range(big // 2, big + big // 2)}
    df = _mk(spark, groups)
    sk = SK.kmv_build(df, "user_id", ["g"], k=128)
    r = SK.kmv_intersect_pairs(sk, "g", k=128).collect()[0]
    true = big // 2
    assert 0.5 * true <= r.intersect_est <= 1.7 * true


def test_zero_overlap_pair_is_reported_as_zero(spark):
    groups = {"a": range(1000), "b": range(50000, 51000)}
    df = _mk(spark, groups)
    sk = SK.kmv_build(df, "user_id", ["g"], k=K)
    r = SK.kmv_intersect_pairs(sk, "g", k=K).collect()[0]
    assert r.shared_below_theta == 0 and r.intersect_est == 0


def test_sketch_merge_is_the_same_operator_over_concatenation(spark):
    """Mergeability: sketch(A ∪ B) == kmv_build over the union of the raw
    relations — and equivalently re-ranking the two sketches' union."""
    a = _mk(spark, {"g": range(300)})
    b = _mk(spark, {"g": range(200, 600)})
    direct = SK.kmv_build(a.unionByName(b), "user_id", ["g"], k=K)
    sk_a = SK.kmv_build(a, "user_id", ["g"], k=K).select("g", "h")
    sk_b = SK.kmv_build(b, "user_id", ["g"], k=K).select("g", "h")
    from pyspark.sql import Window

    merged = (
        sk_a.unionByName(sk_b)
        .distinct()
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("g").orderBy("h"))
        )
        .where(F.col("rk") <= K)
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_build_plans_window_group_limit(spark):
    df = _mk(spark, {"a": range(100)})
    plan = (
        SK.kmv_build(df, "user_id", ["g"], k=K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
