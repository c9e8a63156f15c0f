"""Hashed linear classifier (text.hashed_classifier_score): exact parity
with a pure-Python replay of the hashing-trick weight function, and the
empty-doc guard."""

import hashlib

import pytest
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators.text import (
    CLF_BUCKETS,
    CLF_WRANGE,
    hashed_classifier_score,
)


def _weight(word: str, seed: str = "clfw") -> int:
    bucket = int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % CLF_BUCKETS
    h = int(hashlib.md5(f"{seed}:{bucket}".encode()).hexdigest()[:8], 16)
    return h % CLF_WRANGE - 1000


def _score(text: str) -> tuple[int, int]:
    ws = [w for w in text.lower().split() if w]
    total = sum(_weight(w) for w in ws)
    # Spark's DIV on bigint is floor-toward-zero for positive, truncation
    # semantics match Python's int() toward zero only for same-sign; DIV
    # truncates toward zero like SQL integer division
    q = abs(total) // len(ws)
    return len(ws), q if total >= 0 else -q


DOCS = [
    (1, "table scan merge window dup"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "singleword"),
    (4, "   "),  # whitespace only -> excluded
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_scores_match_python_replay(docs):
    got = {r.doc_id: (r.n_tokens, r.score_pm)
           for r in hashed_classifier_score(docs).collect()}
    assert set(got) == {1, 2, 3}
    for d, text in DOCS[:3]:
        assert got[d] == _score(text), (d, text)


def test_same_token_same_weight_collision_semantics(docs):
    """Repeated tokens contribute the same weight each occurrence: 'the'
    appears twice in doc 2 and must count twice."""
    n, s = _score("the quick brown fox jumps over the lazy dog")
    got = hashed_classifier_score(docs).where(F.col("doc_id") == 2).first()
    assert (got.n_tokens, got.score_pm) == (n, s)
    assert n == 9


def test_scores_bounded(docs):
    for r in hashed_classifier_score(docs).collect():
        assert -1000 <= r.score_pm <= 1000
