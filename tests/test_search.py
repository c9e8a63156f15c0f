"""BM25 retrieval (operators/search.py) — formula parity against a
hand-rolled float BM25, idf ordering, and the exploded-stream guard."""

import math

import pytest
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators import search as SE

DOCS = [
    # (doc_id, text): doc 1 is the only 'zebra' doc; 'cat' is everywhere
    (1, "zebra cat runs fast"),
    (2, "cat cat cat sits"),
    (3, "cat naps all day long today quietly"),
    (4, "dog barks at cat"),
    (5, "bird sings"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _float_bm25(terms, k1=1.2, b=0.75):
    """Reference float BM25 (Lucene non-negative idf, log2 base to match
    the operator's fixed-point units)."""
    toks = {d: t.lower().split() for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for term in terms:
        df = sum(1 for w in toks.values() if term in w)
        if df == 0:
            continue
        idf = math.log2((2 * n + 2) / (2 * df + 1))
        for d, w in toks.items():
            tf = w.count(term)
            if not tf:
                continue
            norm = tf + k1 * (1 - b + b * len(w) / avgdl)
            out[d] = out.get(d, 0.0) + idf * tf * (k1 + 1) / norm
    return out


def _ilog2fp(n, quant=SE.QUANT):
    """Pure-Python replay of text.ilog2fp_sql: (b-1) + mantissa/2^(b-1) - 1
    in fixed point, with the same >43-bit shift guard."""
    b = n.bit_length()
    s = max(b - 43, 0)
    return (b - 1) * quant + ((n >> s) * quant) // (1 << (b - 1 - s)) - quant


def _int_bm25(terms):
    """Exact integer replay of search.bm25_topk's formula — every floor in
    the same place, so equality is bit-for-bit."""
    toks = {d: t.lower().split() for d, t in DOCS}
    n = len(DOCS)
    big_l = sum(len(w) for w in toks.values())
    shift = max(big_l.bit_length() - 30, 0)
    ls, ns = big_l >> shift, n >> shift
    out = {}
    for term in terms:
        df = sum(1 for w in toks.values() if term in w)
        if df == 0:
            continue
        idf = _ilog2fp(2 * n + 2) - _ilog2fp(2 * df + 1)
        for d, w in toks.items():
            tf = w.count(term)
            if not tf:
                continue
            r = (18 * len(w) * ns) // ls
            tfq = (tf * 44 * SE.QUANT) // (20 * tf + 6 + r)
            out[d] = out.get(d, 0) + (idf * tfq) // SE.QUANT
    return out


def test_matches_exact_integer_replay_and_float_ranking(docs):
    rows = SE.bm25_topk(docs, ["zebra", "cat"], k=5).collect()
    got = {r.doc_id: r.score for r in rows}
    # bit-for-bit parity with the pure-Python replay of the formula
    assert got == _int_bm25(["zebra", "cat"])
    # ranking identical to true float BM25 (the approximation is monotone
    # enough on this fixture; ties in the fixed-point ranks break by id)
    ref = _float_bm25(["zebra", "cat"])
    assert [r.doc_id for r in rows] == sorted(ref, key=lambda d: (-ref[d], d))
    # fixed-point value within the documented ilog2fp error envelope
    # (0.0861 bits per log call, two calls per idf, times tfnorm <= 2.2)
    for d, s in got.items():
        assert abs(s / SE.QUANT - ref[d]) < 2 * 2.2 * 0.0861 + 0.01


def test_rare_term_outranks_common_term(docs):
    """The zebra-only doc must beat every cat-only doc: idf(zebra) >>
    idf(cat) at equal-ish tf."""
    rows = SE.bm25_topk(docs, ["zebra", "cat"], k=5).collect()
    assert rows[0].doc_id == 1


def test_n_terms_counts_matched_terms(docs):
    rows = {r.doc_id: r.n_terms for r in
            SE.bm25_topk(docs, ["zebra", "cat"], k=5).collect()}
    assert rows[1] == 2 and rows[2] == 1


def test_postings_stream_is_match_sized(docs):
    """The explode must emit only matching occurrences: doc 2 has 4
    tokens but only the 3 'cat's may reach the postings aggregation."""
    p = SE.term_postings(docs, ["cat"]).collect()
    assert {(r.doc_id, r.tf) for r in p} == {(1, 1), (2, 3), (3, 1), (4, 1)}


def test_no_match_returns_empty(docs):
    assert SE.bm25_topk(docs, ["nosuchword"], k=5).count() == 0
