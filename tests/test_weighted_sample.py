"""Efraimidis-Spirakis weighted sampling (scan.weighted_sample_topk):
exact-key parity with a pure-Python replay, the selection-law property
(heavier rows win proportionally more), and determinism under re-run."""

import hashlib

import pytest
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators.scan import weighted_sample_topk

QUANT = 1 << 20


def _es_key(doc_id: int, w: int, seed: str = "es1") -> int:
    u = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16)
    u = u % QUANT + 1
    b = u.bit_length()
    s = max(b - 43, 0)
    ilog = (b - 1) * QUANT + ((u >> s) * QUANT) // (1 << (b - 1 - s)) - QUANT
    return ((20 * QUANT - ilog) * QUANT) // w


@pytest.fixture(scope="module")
def rows(spark):
    # even ids weigh 9, odd ids weigh 1
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(9)).otherwise(F.lit(1))
        .cast("bigint").alias("w"),
    )


def test_keys_match_python_replay(rows):
    got = weighted_sample_topk(rows, "w", "doc_id", 30).collect()
    for r in got:
        assert r.es_key == _es_key(r.doc_id, r.w)
    # and they really are the global bottom-30 keys
    all_keys = sorted(
        (_es_key(i, 9 if i % 2 == 0 else 1), i) for i in range(2000)
    )[:30]
    assert [(r.es_key, r.doc_id) for r in got] == all_keys


def test_selection_law_prefers_heavy_rows(rows):
    """w=9 rows are 50% of the population but must dominate the sample.
    E-S with a 9:1 weight ratio yields ~85-90% heavy rows at this depth;
    assert a generous floor so the test pins the LAW, not the noise."""
    got = weighted_sample_topk(rows, "w", "doc_id", 400).collect()
    heavy = sum(1 for r in got if r.w == 9)
    assert heavy / 400 > 0.75


def test_deterministic_across_runs(rows):
    a = [r.doc_id for r in weighted_sample_topk(rows, "w", "doc_id", 50).collect()]
    b = [r.doc_id for r in weighted_sample_topk(rows, "w", "doc_id", 50).collect()]
    assert a == b


def test_nonpositive_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4)], ["doc_id", "w"]
    )
    got = weighted_sample_topk(df, "w", "doc_id", 10).collect()
    assert [r.doc_id for r in got] == [1]


def test_group_sample_exactly_k_per_group_and_key_parity(spark):
    from spark_on_hbase_spark.operators.scan import weighted_group_sample

    df = spark.range(600).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") % 7 + 1).cast("bigint").alias("w"),
    )
    got = weighted_group_sample(df, "grp", "w", "doc_id", 5).collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r.grp, []).append(r)
    assert set(by_grp) == {"0", "1", "2"}
    for g, rows in by_grp.items():
        assert len(rows) == 5
        assert sorted(r.sample_rank for r in rows) == [1, 2, 3, 4, 5]
        # winners really are the group's bottom-5 E-S keys
        ids = [i for i in range(600) if str(i % 3) == g]
        expect = sorted((_es_key(i, i % 7 + 1), i) for i in ids)[:5]
        assert sorted((r.es_key, r.doc_id) for r in rows) == expect


def test_group_sample_plans_window_group_limit(spark):
    from spark_on_hbase_spark.operators.scan import weighted_group_sample

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("grp"),
        F.lit(3).cast("bigint").alias("w"),
    )
    plan = (
        weighted_group_sample(df, "grp", "w", "doc_id", 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
