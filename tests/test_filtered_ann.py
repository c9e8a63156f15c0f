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


# ---------------------------------------------------------------------------
# hard-negative mining (similarity.hard_negative_topk)
# ---------------------------------------------------------------------------


def _brute_hard_negatives(rows, qid, k, semi_hard):
    """Python replay: quantized cosine, different-label negatives, optional
    strictly-below-hardest-positive gate, (cosine desc, vec_id) order."""
    import math

    def qz(v):
        return [math.floor(x * 1_000_000) for x in v]

    by_id = {i: (qz(v), l) for i, v, l in rows}
    qv, ql = by_id[qid]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a)
        nb = sum(x * x for x in b)
        return dot / (math.sqrt(na) * math.sqrt(nb))

    pos = [cos(qv, v) for i, (v, l) in by_id.items() if l == ql and i != qid]
    pos_max = max(pos) if pos else 2.0
    neg = [
        (cos(qv, v), i, l) for i, (v, l) in by_id.items() if l != ql
    ]
    if semi_hard:
        neg = [t for t in neg if t[0] < pos_max]
    neg.sort(key=lambda t: (-t[0], t[1]))
    return [(i, c, l, pos_max) for c, i, l in neg[:k]]


def test_hard_negatives_match_python_replay(vecs):
    from spark_on_hbase_spark.operators.similarity import hard_negative_topk

    rows = [(r.vec_id, r.embedding, r.label) for r in vecs.collect()]
    for semi in (False, True):
        got = hard_negative_topk(
            vecs, vecs.where(F.col("vec_id").isin([0, 1, 18])), k=4,
            semi_hard=semi,
        ).collect()
        for qid in (0, 1, 18):
            mine = [
                (r.vec_id, r.cosine, r.label, r.pos_max)
                for r in sorted(
                    (x for x in got if x.query_id == qid),
                    key=lambda x: x.rank,
                )
            ]
            assert mine == _brute_hard_negatives(rows, qid, 4, semi)


def test_semi_hard_gate_drops_above_positive_negatives(spark):
    """A negative MORE similar than the hardest positive is excluded by
    the semi-hard band and kept by the plain mode."""
    from spark_on_hbase_spark.operators.similarity import hard_negative_topk

    rows = [
        (0, [1.0, 0.0], 0),   # anchor
        (1, [0.6, 0.8], 0),   # positive, cos ~ 0.6
        (2, [1.0, 0.01], 1),  # near-duplicate negative, cos ~ 1 (label noise)
        (3, [0.0, 1.0], 1),   # easy negative, cos 0
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = vecs.where(F.col("vec_id") == 0)
    plain = {r.vec_id for r in hard_negative_topk(vecs, q, k=5, semi_hard=False).collect()}
    semi = {r.vec_id for r in hard_negative_topk(vecs, q, k=5, semi_hard=True).collect()}
    assert plain == {2, 3}
    assert semi == {3}


def test_anchor_without_positives_keeps_all_negatives(spark):
    from spark_on_hbase_spark.operators.similarity import hard_negative_topk

    rows = [
        (0, [1.0, 0.0], 9),   # sole member of label 9
        (1, [0.9, 0.1], 1),
        (2, [0.0, 1.0], 2),
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = hard_negative_topk(
        vecs, vecs.where(F.col("vec_id") == 0), k=5, semi_hard=True
    ).collect()
    assert {r.vec_id for r in got} == {1, 2}
    assert all(r.pos_max == 2.0 for r in got)
