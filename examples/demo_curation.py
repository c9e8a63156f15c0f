"""Runnable tour of the round-10 training-data curation operators: BM25
retrieval, weighted sampling, the hashed quality classifier, token
entropy, the stupid-backoff LM, UniMax budgets and DoReMi reweighting —
the operators a 100 TB pre-training sweep chains together.

    python examples/demo_curation.py
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from spark_on_hbase_spark import get_spark
from spark_on_hbase_spark.operators import agg as A
from spark_on_hbase_spark.operators import search as SE
from spark_on_hbase_spark.operators import text as T
from spark_on_hbase_spark.operators.scan import (
    weighted_group_sample,
    weighted_sample_topk,
)

DOCS = [
    (1, "web", "the cat sat on the mat and the dog barked at the cat"),
    (2, "web", "spam spam spam spam spam spam spam spam spam spam"),
    (3, "books", "a quiet study of rivers and the slow work of water"),
    (4, "books", "the cat sat on the mat and the dog barked at the cat"),
    (5, "code", "def main return zero end def helper return one end"),
    (6, "code", "x x x x y y y y z z z z x x y y"),
]


def main() -> None:
    spark = get_spark("demo-curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.createDataFrame(DOCS, ["doc_id", "source", "text"])

    print("== BM25 retrieval: query = [cat, rivers] ==")
    SE.bm25_topk(docs, ["cat", "rivers"], k=3).show(truncate=False)

    print("== token entropy (low = repetitive boilerplate) ==")
    T.token_entropy(docs).orderBy("ent_fp").show()

    print("== hashed-classifier quality scores (map-only inference) ==")
    T.hashed_classifier_score(docs).show()

    print("== stupid-backoff trigram LM: score doc 4 against docs 1-3 ==")
    m3, m2, m1 = T.backoff_lm(docs.where(F.col("doc_id") <= 3))
    T.backoff_score(docs.where(F.col("doc_id") >= 4), m3, m2, m1).show()

    print("== weighted sample (P ~ doc length), then 1 per source ==")
    sized = docs.withColumn(
        "n_chars", F.length("text").cast("bigint")
    )
    weighted_sample_topk(sized, "n_chars", "doc_id", 3).show()
    weighted_group_sample(sized, "source", "n_chars", "doc_id", 1).show()

    print("== UniMax budget across sources (cap = 2 epochs) ==")
    sizes = (
        sized.groupBy("source")
        .agg(F.sum(F.size(T.words_expr("text"))).cast("bigint").alias("n_tokens"))
        .withColumn("cap", (F.col("n_tokens") * 2).cast("bigint"))
    )
    A.unimax_waterfill(sizes, "(3 * __tot) DIV 2").show()

    print("== DoReMi: upweight the hardest (lowest-scoring) sources ==")
    losses = (
        T.hashed_classifier_score(docs.select("source", "doc_id", "text"), id_col="source")
        .groupBy("source")
        .agg(
            F.expr("1000 - (CAST(SUM(score_pm) AS BIGINT) DIV COUNT(*))")
            .cast("bigint").alias("loss_pm")
        )
    )
    A.doremi_reweight(losses).show()


if __name__ == "__main__":
    main()
