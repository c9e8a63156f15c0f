"""Filtered vector search (similarity.filtered_topk): predicate
correctness, equivalence to brute force over the pre-filtered candidate
set, the underfill case, and the WindowGroupLimit plan."""

import pytest
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators.similarity import brute_force_topk, filtered_topk


@pytest.fixture(scope="module")
def vecs(spark):
    # 3 labels; label 2 has only 2 members (underfill at k=3)
    rows = []
    for i in range(20):
        label = 2 if i >= 18 else i % 2
        rows.append((i, [float(i % 7) + 0.5, float(i % 3) - 1.0, 1.0], label))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_only_matching_labels_and_brute_equivalence(vecs):
    queries = vecs.where(F.col("vec_id").isin([0, 1]))
    got = filtered_topk(vecs, queries, k=3).collect()
    labels = {r.vec_id: r.label for r in vecs.collect()}
    for r in got:
        assert r.label == labels[r.query_id]
    # per query, identical to brute force over the pre-filtered candidates
    for qid in (0, 1):
        ref = brute_force_topk(
            vecs.where(F.col("label") == labels[qid]),
            vecs.where(F.col("vec_id") == qid),
            k=3,
        ).collect()
        mine = [(r.vec_id, r.cosine, r.rank) for r in got if r.query_id == qid]
        assert sorted(mine) == sorted((r.vec_id, r.cosine, r.rank) for r in ref)


def test_selective_predicate_underfills_instead_of_leaking(vecs):
    queries = vecs.where(F.col("vec_id") == 18)  # label 2: one other member
    got = filtered_topk(vecs, queries, k=3).collect()
    assert [(r.vec_id, r.label) for r in got] == [(19, 2)]


def test_plans_window_group_limit(vecs):
    queries = vecs.where(F.col("vec_id") == 0)
    plan = (
        filtered_topk(vecs, queries, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
