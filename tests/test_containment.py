"""Containment dedup (dedup.containment_pairs): catches the subset-doc
modality Jaccard misses, agrees with a brute-force reference."""

import itertools

import pytest
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
    shingles_from_words,
)
from spark_on_hbase_spark.operators.text import words_expr

BIG = "w" + " w".join(str(i) for i in range(200))  # 200 distinct words
EXCERPT = " ".join(BIG.split()[50:70])             # 20-word verbatim slice
DOCS = [(1, BIG), (2, EXCERPT), (3, "totally different text about cats " * 4)]


@pytest.fixture(scope="module")
def exploded(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    ws = df.select("doc_id", words_expr(F.lower(F.col("text"))).alias("__ws"))
    return ws.select(
        "doc_id", F.explode(shingles_from_words(F.col("__ws"), 5)).alias("shingle")
    )


def _brute(threshold):
    def sh(text):
        w = text.lower().split()
        return {" ".join(w[i:i + 5]) for i in range(len(w) - 4)}

    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        a, b = sh(ta), sh(tb)
        shared = len(a & b)
        if shared and shared / min(len(a), len(b)) >= threshold:
            out[(ia, ib)] = (shared, len(a), len(b))
    return out


def test_containment_catches_the_excerpt_jaccard_misses(exploded):
    got = {(r.id_a, r.id_b): (r.shared, r.n_a, r.n_b)
           for r in containment_pairs(exploded, "doc_id", "shingle", 0.95).collect()}
    assert got == _brute(0.95)
    assert (1, 2) in got  # the verbatim excerpt
    # Jaccard at any usable symmetric threshold does NOT flag it:
    # shared=16, union=196+16-16=196 -> jaccard ~0.08
    jac = {(r.id_a, r.id_b)
           for r in ngram_jaccard_pairs(exploded, "doc_id", "shingle", 0.6).collect()}
    assert (1, 2) not in jac


def test_threshold_gates(exploded):
    # raising tau above the excerpt's containment (1.0) is impossible;
    # check an unrelated pair never appears at any threshold
    got = {(r.id_a, r.id_b)
           for r in containment_pairs(exploded, "doc_id", "shingle", 0.5).collect()}
    assert (1, 3) not in got and (2, 3) not in got
