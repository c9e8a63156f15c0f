"""Stupid-backoff trigram LM (text.backoff_lm / backoff_score): every
backoff level exercised on a constructed corpus, values pinned against a
pure-Python replay of the quantized arithmetic."""

import pytest
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators.text import LM_QUANT, backoff_lm, backoff_score

TRAIN = [
    (1, "a b c a b c"),        # trigrams: 'a b c' x2, 'b c a', 'c a b'
    (2, "a b d"),              # 'a b d'
    (3, "x y"),                # no trigrams; bigram 'x y', unigrams x y
]
# score doc: 'a b c' seen (l3); 'b c x' unseen, suffix 'c x' unseen,
# 'x' seen (l1); 'c x y' unseen, suffix 'x y' SEEN (l2); 'x y q' unseen at
# every level (contribution 0)
SCORE = [(10, "a b c x y q")]


def _counts():
    c1, c2, c3 = {}, {}, {}
    for _, t in TRAIN:
        ws = t.split()
        for w in ws:
            c1[w] = c1.get(w, 0) + 1
        for i in range(len(ws) - 1):
            b = " ".join(ws[i:i + 2])
            c2[b] = c2.get(b, 0) + 1
        for i in range(len(ws) - 2):
            tr = " ".join(ws[i:i + 3])
            c3[tr] = c3.get(tr, 0) + 1
    return c1, c2, c3, sum(c1.values())


def _expected():
    c1, c2, c3, L = _counts()
    q3 = {t: int(c / c2[" ".join(t.split()[:2])] * LM_QUANT // 1)
          for t, c in c3.items()}
    q2 = {b: (2 * int(c / c1[b.split()[0]] * LM_QUANT // 1)) // 5
          for b, c in c2.items()}
    q1 = {w: (4 * int(c / L * LM_QUANT // 1)) // 25 for w, c in c1.items()}
    ws = SCORE[0][1].split()
    score, n3, n2, n1 = 0, 0, 0, 0
    for i in range(len(ws) - 2):
        tri = " ".join(ws[i:i + 3])
        sfx = " ".join(ws[i + 1:i + 3])
        w3 = ws[i + 2]
        if tri in q3:
            score += q3[tri]; n3 += 1
        elif sfx in q2:
            score += q2[sfx]; n2 += 1
        elif w3 in q1:
            score += q1[w3]; n1 += 1
    return len(ws) - 2, score, n3, n2, n1


def test_backoff_chain_levels_and_values(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    score = spark.createDataFrame(SCORE, ["doc_id", "text"])
    m3, m2, m1 = backoff_lm(train)
    got = backoff_score(score, m3, m2, m1).first()
    n_tri, s, n3, n2, n1 = _expected()
    assert (got.n_tri, got.score_q, got.n_l3, got.n_l2, got.n_l1) == (
        n_tri, s, n3, n2, n1
    )
    # the fixture really does exercise every level plus the all-unseen 0
    assert n3 >= 1 and n2 >= 1 and n1 >= 1 and n3 + n2 + n1 < n_tri


def test_seen_text_scores_higher_than_shuffled(spark):
    """In-domain text backs off less and scores higher per trigram than
    out-of-domain text under the same model."""
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    m3, m2, m1 = backoff_lm(train)
    probe = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "q r s t u v")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in backoff_score(probe, m3, m2, m1).collect()}
    assert rows[1].score_q > rows[2].score_q
    assert rows[2].score_q == 0  # fully out-of-vocabulary

def test_short_docs_have_no_trigrams(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    m3, m2, m1 = backoff_lm(train)
    probe = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    assert backoff_score(probe, m3, m2, m1).count() == 0
