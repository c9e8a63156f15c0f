"""Unigram-LM learning: the Spark lattice EM must match a pure-Python
fixed-point reference bit-for-bit (the PQ/quality-model reference-twin
discipline), and the fold/posterior arithmetic must obey the exact
integer contracts the oracle replays."""

from collections import Counter

from spark_on_hbase_spark.operators import text as T

S = T.UNI_SCALE
PPM = T.UNI_PPM


def _ref_census(texts, max_word_len=8):
    c = Counter()
    for t in texts:
        for w in t.lower().split():
            if 1 <= len(w) <= max_word_len:
                c[w] += 1
    return dict(c)


def _ref_pieces(word, pmax=4):
    return [
        (j, j + l, word[j : j + l])
        for j in range(len(word))
        for l in range(1, min(pmax, len(word) - j) + 1)
    ]


def _ref_seed(census, min_count=2):
    c = Counter()
    for w, wc in census.items():
        for _, _, p in _ref_pieces(w):
            c[p] += wc
    return {p: n for p, n in c.items() if len(p) == 1 or n >= min_count}


def _ref_rescore(cnts):
    tot = sum(cnts.values())
    return {p: (c * S) // tot for p, c in cnts.items()}


def _ref_em_round(census, vocab):
    out = Counter()
    for w, wc in census.items():
        wl = len(w)
        edges = [(j, i, p) for j, i, p in _ref_pieces(w) if p in vocab]
        alpha = [S] + [0] * wl
        for i in range(1, wl + 1):
            alpha[i] = (
                sum(alpha[j] * vocab[p] for j, i2, p in edges if i2 == i) // S
            )
        beta = [0] * wl + [S]
        for j in range(wl - 1, -1, -1):
            beta[j] = (
                sum(vocab[p] * beta[i] for j2, i, p in edges if j2 == j) // S
            )
        if alpha[wl] == 0:
            continue
        for j, i, p in edges:
            e = ((alpha[j] * vocab[p] // S) * beta[i] // S) * PPM // alpha[wl]
            out[p] += wc * e
    return dict(out)


def _ref_learn(texts, keep_multi=120):
    census = _ref_census(texts)
    cnt1 = _ref_em_round(census, _ref_rescore(_ref_seed(census)))
    singles = {p: c for p, c in cnt1.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt1.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:keep_multi]
    kept = {p: c for p, c in {**singles, **dict(multi)}.items() if c > 0}
    cnt2 = {
        p: c
        for p, c in _ref_em_round(census, _ref_rescore(kept)).items()
        if c > 0
    }
    tot = sum(cnt2.values())
    return {
        p: (len(p), c, (c * S) // tot) for p, c in cnt2.items()
    }


TEXTS = [
    "the spark engine scans the table and scans the index",
    "the engine joins the table with the index table",
    "spark joins scans and index reads the engine loves",
    "reads and writes the spark table engine writes scans",
    "a b c a b c the the the engine",
]


def test_unigram_learn_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    got = {
        r["piece"]: (r["piece_len"], r["cnt_ppm"], r["p_fp"])
        for r in T.unigram_learn(df).collect()
    }
    want = _ref_learn(TEXTS)
    assert got == want


def test_single_char_only_vocab_recovers_exact_char_counts(spark):
    """With only single-char pieces every lattice has ONE path, so each
    char edge's posterior is 1.0 up to fixed-point truncation — expected
    counts must sit within the truncation envelope of the true counts."""
    df = spark.createDataFrame([(1, "abc abd")], "doc_id bigint, text string")
    census = T.unigram_census(df)
    singles = T.unigram_seed(census).where("length(piece) = 1")
    vocab = T.unigram_rescore(singles)
    got = {
        r["piece"]: r["cnt_ppm"]
        for r in T.unigram_em_round(census, vocab).collect()
    }
    true_counts = Counter("abcabd")
    for ch, n in true_counts.items():
        assert 0.95 * n * PPM <= got[ch] <= n * PPM


def test_prune_always_keeps_single_chars(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    census = T.unigram_census(df)
    cnt1 = T.unigram_em_round(census, T.unigram_rescore(T.unigram_seed(census)))
    kept = {r["piece"] for r in T.unigram_prune(cnt1, keep_multi=3).collect()}
    singles = {r["piece"] for r in cnt1.where("length(piece)=1").collect()}
    assert singles <= kept
    assert len([p for p in kept if len(p) > 1]) == 3
