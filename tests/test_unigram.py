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


# ---------------------------------------------------------------------------
# Viterbi tokenization (the apply side)
# ---------------------------------------------------------------------------


def _ref_ilog2fp(n, quant=1 << 20):
    b = n.bit_length()
    s = max(b - 43, 0)
    return (b - 1) * quant + ((n >> s) * quant) // (1 << (b - 1 - s)) - quant


def _ref_logw(p_fp):
    return _ref_ilog2fp(max(p_fp, 1)) - 20 * (1 << 20)


def _ref_viterbi(word, vocab):
    """Pure-Python twin of text.unigram_viterbi_segment's folds: forward
    max-fold, then backward reconstruction choosing the smallest j
    (longest piece) among optimum-achieving edges."""
    wl = len(word)
    edges = [(j, i, p) for j, i, p in _ref_pieces(word) if p in vocab]
    if not edges:
        return None
    w = {}
    for j, i, p in edges:
        w[(j, i)] = _ref_logw(vocab[p])
    NEG = -(1 << 40)
    best = [0] + [NEG] * wl
    for i in range(1, wl + 1):
        cands = [best[j] + w[(j, i)] for j, i2, _ in edges if i2 == i]
        best[i] = max(cands) if cands else NEG
    if best[wl] <= -(1 << 39):
        return None
    toks, pos = [], wl
    while pos > 0:
        js = [
            j
            for j, i, _ in edges
            if i == pos and best[j] + w[(j, pos)] == best[pos]
        ]
        j = min(js)
        toks.insert(0, word[j:pos])
        pos = j
    return toks


def _ref_vocab_pfp(texts):
    return {p: pfp for p, (_, _, pfp) in _ref_learn(texts).items()}


def test_viterbi_segment_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    vocab_pfp = _ref_vocab_pfp(TEXTS)
    vocab_df = spark.createDataFrame(
        [(p, v) for p, v in vocab_pfp.items()], "piece string, p_fp bigint"
    )
    census = T.unigram_census(df)
    got = {
        r["word"]: r["toks"]
        for r in T.unigram_viterbi_segment(census, vocab_df).collect()
    }
    want = {
        w: _ref_viterbi(w, vocab_pfp)
        for w in _ref_census(TEXTS)
        if _ref_viterbi(w, vocab_pfp) is not None
    }
    assert got == want
    # segmentations reassemble their words exactly
    for wd, toks in got.items():
        assert "".join(toks) == wd


def test_viterbi_prefers_high_probability_pieces(spark):
    """'abcd' with vocab {ab:high, cd:high, singles:low} must segment as
    [ab, cd], not chars; and the longest-piece tiebreak picks 'abcd' when
    it ties the pair path."""
    df = spark.createDataFrame([(1, "abcd")], "doc_id bigint, text string")
    census = T.unigram_census(df)
    vocab = spark.createDataFrame(
        [("a", 10), ("b", 10), ("c", 10), ("d", 10), ("ab", 200000), ("cd", 200000)],
        "piece string, p_fp bigint",
    )
    got = T.unigram_viterbi_segment(census, vocab).collect()
    assert got[0]["toks"] == ["ab", "cd"]


def test_viterbi_drops_unsegmentable_words(spark):
    """A word containing a char absent from the vocabulary has an
    unreachable end position and is dropped (identically in the oracle)."""
    df = spark.createDataFrame([(1, "ax ab")], "doc_id bigint, text string")
    census = T.unigram_census(df)
    vocab = spark.createDataFrame(
        [("a", 100), ("b", 100)], "piece string, p_fp bigint"
    )
    got = {r["word"] for r in T.unigram_viterbi_segment(census, vocab).collect()}
    assert got == {"ab"}


def test_unigram_token_counts_census_conservation(spark):
    """n_tok summed over pieces == total segmented-word token mass: every
    corpus occurrence of every segmentable word contributes exactly its
    piece count — nothing lost, nothing double-counted."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    vocab_pfp = _ref_vocab_pfp(TEXTS)
    vocab_df = spark.createDataFrame(
        [(p, v) for p, v in vocab_pfp.items()], "piece string, p_fp bigint"
    )
    got = {
        r["piece"]: (r["n_tok"], r["n_types"])
        for r in T.unigram_token_counts(df, vocab_df).collect()
    }
    census = _ref_census(TEXTS)
    want_tok = Counter()
    want_types = Counter()
    for wd, wc in census.items():
        toks = _ref_viterbi(wd, vocab_pfp)
        if toks is None:
            continue
        for p in toks:
            want_tok[p] += wc
        for p in set(toks):
            want_types[p] += 1
    assert got == {p: (want_tok[p], want_types[p]) for p in want_tok}
    assert sum(n for n, _ in got.values()) == sum(
        wc * len(_ref_viterbi(wd, vocab_pfp))
        for wd, wc in census.items()
        if _ref_viterbi(wd, vocab_pfp) is not None
    )
