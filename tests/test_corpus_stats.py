"""Zipf-fit corpus statistic (text.zipf_fit): the integer OLS must match a
pure-Python replay of the same fixed-point arithmetic, and the exponent must
recover a planted power law."""

from collections import Counter

from spark_on_hbase_spark.operators import text as T

Q = T.ZIPF_QUANT


def _ref_ilog2fp(n, quant=Q):
    b = n.bit_length()
    s = max(b - 43, 0)
    return (b - 1) * quant + ((n >> s) * quant) // (1 << (b - 1 - s)) - quant


def _ref_zipf(texts, top_n=200):
    c = Counter(w for t in texts for w in t.lower().split() if w)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    pts = [
        (_ref_ilog2fp(rk + 1), _ref_ilog2fp(cnt))
        for rk, (_, cnt) in enumerate(ranked)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    return (n, num, den, (max(-num, 0) * 1000) // den)


def test_zipf_fit_matches_python_replay(spark):
    texts = [
        "the the the the quick brown fox jumps over the lazy dog",
        "the quick fox runs and the dog sleeps while foxes dream",
        "a a a b b c d e f g h the quick quick brown",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = T.zipf_fit(df, top_n=10).collect()[0]
    n, num, den, am = _ref_zipf(texts, top_n=10)
    assert (got.n_terms, got.slope_num, got.slope_den, got.alpha_milli) == (
        n, num, den, am,
    )


def test_zipf_recovers_planted_power_law(spark):
    """counts = floor(C / rank): alpha_milli should land near 1000."""
    rows = []
    did = 0
    for rk in range(1, 51):
        word = f"w{rk:03d}"
        for _ in range(12000 // rk):
            rows.append((did, word))
            did += 1
    df = (
        spark.createDataFrame(rows, "doc_id bigint, text string")
        .groupBy("doc_id")
        .agg({"text": "first"})
        .withColumnRenamed("first(text)", "text")
    )
    got = T.zipf_fit(df, top_n=50).collect()[0]
    assert 900 <= got.alpha_milli <= 1100
    assert got.slope_num < 0 < got.slope_den
