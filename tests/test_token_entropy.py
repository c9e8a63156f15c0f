"""Token entropy (text.token_entropy): exact parity with a pure-Python
fixed-point replay, and the ordering property (repetitive < diverse)."""

import pytest

from spark_on_hbase_spark.operators.text import token_entropy

QUANT = 1 << 20

DOCS = [
    (1, "spam spam spam spam spam spam spam spam"),   # zero entropy
    (2, "a b a b a b a b"),                           # 1 bit
    (3, "a b c d e f g h"),                           # 3 bits (uniform 8)
    (4, "x x x x x x x y"),                           # low but nonzero
]


def _ilog2fp(n):
    b = n.bit_length()
    s = max(b - 43, 0)
    return (b - 1) * QUANT + ((n >> s) * QUANT) // (1 << (b - 1 - s)) - QUANT


def _ent(text):
    ws = text.split()
    n = len(ws)
    cnts = {}
    for w in ws:
        cnts[w] = cnts.get(w, 0) + 1
    return _ilog2fp(n) - sum(c * _ilog2fp(c) for c in cnts.values()) // n


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_matches_python_replay(docs):
    got = {r.doc_id: (r.n_tokens, r.ent_fp)
           for r in token_entropy(docs).collect()}
    for d, t in DOCS:
        assert got[d] == (len(t.split()), _ent(t)), d


def test_entropy_ordering_and_exact_powers_of_two(docs):
    got = {r.doc_id: r.ent_fp for r in token_entropy(docs).collect()}
    # powers of two are EXACT under the mantissa approximation
    assert got[1] == 0
    assert got[2] == QUANT        # exactly 1 bit
    assert got[3] == 3 * QUANT    # exactly 3 bits
    assert got[1] < got[4] < got[2] < got[3]
