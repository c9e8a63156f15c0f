"""Full-text retrieval over the documents table: BM25 term scoring with
exact integer arithmetic (engine-portable — the oracle replays the same
fixed-point formula in DuckDB).

The reference engine exposes keyed scans + filters; text retrieval is part
of this repo's training-data-pipeline extension surface (SURVEY.md §7.2
step 8 family), giving the corpus a search-shaped read path: selective
term lookup, not corpus scoring.

Scale design (the inverted-index argument): the corpus-sized work is
THREE column-pruned documents scans — the postings derivation, a second
planning of it under the per-term df aggregation (Catalyst prunes the tf
column from that branch, so the exchanges differ and the scan is not
reused), and the 2-value (N docs, L tokens) stats aggregate broadcast
back. Everything downstream of the scans is match-sized: the query terms
are a tiny literal set, so the word filter runs INSIDE the per-row word
array before the explode and the exploded postings stream is proportional
to matching occurrences, not corpus tokens. (A per-term window for df
would drop one scan but concentrate each common term's postings in one
partition — real skew at corpus scale — so the extra pruned scan is the
right trade.) On a real deployment the postings relation is the stored
inverted index (a KeyedTable keyed by term), all three scans collapse
into index reads, and the graded query demonstrates the probe math.

BM25 (Robertson/Sparck Jones; Lucene's non-negative idf form) in 2^-20
fixed-point log2 units, k1 = 1.2, b = 0.75 as exact rationals:

    idf_fp(t)  = ilog2fp(2N + 2) - ilog2fp(2 df_t + 1)          >= 0
    r          = (18 * dl * Ns) // Ls          # b-normalized length term
    tfq(t, d)  = (tf * 44 * QUANT) // (20 tf + 6 + r)
    score(d)   = sum_t (idf_fp(t) * tfq(t, d)) // QUANT

where (Ls, Ns) = (L, N) >> max(bitlen(L) - 30, 0) — the same int64
overflow guard as text.ilog2fp_sql: both engines drop the SAME low bits,
so the integer result is bit-identical, and the dropped precision
(relative 2^-30 on the length normalizer) is far below ranking
resolution. The 44/20/6 constants are BM25's (k1+1), denominators cleared:
tf*(k1+1) / (tf + k1(1-b) + k1*b*dl/avgdl) with k1=6/5, b=3/4 multiplied
through by 20.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators.text import (
    DSIR_QUANT as QUANT,
    ilog2fp_sql,
    words_expr,
)


def _ilog(expr: str, dialect: str) -> str:
    return ilog2fp_sql(expr, dialect, QUANT)


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row (n_docs, n_tokens, shift, ls, ns) relation: the global BM25
    normalization constants, shift-guarded for int64 (see module doc)."""
    stats = df.select(
        F.size(words_expr(F.lower(F.col(text_col)))).alias("__dl")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("__dl").cast("bigint").alias("n_tokens"),
    )
    return stats.selectExpr(
        "n_docs",
        "n_tokens",
        "CAST(greatest(length(bin(n_tokens)) - 30, 0) AS INT) AS shift",
    ).selectExpr(
        "n_docs",
        "n_tokens",
        "shift",
        "shiftright(n_tokens, shift) AS ls",
        "shiftright(n_docs, shift) AS ns",
    )


def term_postings(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term, tf, dl) for the given terms only. The term filter is
    applied to the in-row words array BEFORE the explode, so the exploded
    stream carries only matching occurrences."""
    term_arr = F.array(*[F.lit(t) for t in terms])
    ws = words_expr(F.lower(F.col(text_col)))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).alias("dl"),
        F.filter(ws, lambda w: F.array_contains(term_arr, w)).alias("__m"),
    )
    return (
        base.where(F.size("__m") > 0)
        .select("doc_id", "dl", F.explode("__m").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by integer BM25 over ``terms``: (doc_id, n_terms,
    score) ordered by (score desc, doc_id). See module doc for the exact
    fixed-point formula the oracle replays."""
    postings = term_postings(df, terms, text_col, id_col)
    df_t = postings.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df_t")
    )
    stats = corpus_stats(df, text_col)
    scored = (
        postings.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__idf_num", (F.col("n_docs") * 2 + 2).cast("bigint"))
        .withColumn("__idf_den", (F.col("df_t") * 2 + 1).cast("bigint"))
        .withColumn(
            "__idf",
            F.expr(_ilog("__idf_num", "spark"))
            - F.expr(_ilog("__idf_den", "spark")),
        )
        .withColumn("__r", F.expr("CAST((18 * dl * ns) DIV ls AS BIGINT)"))
        .withColumn(
            "__tfq",
            F.expr(f"(tf * 44 * {QUANT}) DIV (20 * tf + 6 + __r)"),
        )
        .withColumn("__contrib", F.expr(f"(__idf * __tfq) DIV {QUANT}"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.sum("__contrib").cast("bigint").alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )


def bm25_oracle_sql(terms: list[str], k: int = 20) -> str:
    """DuckDB twin of bm25_topk over the ``documents`` view — same
    tokenization, same fixed-point integer formula."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    ilog = lambda s: _ilog(s, "duckdb")  # noqa: E731
    return f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS ws
        FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(len(ws)) AS BIGINT) AS n_tokens
        FROM toks
    ),
    guarded AS (
        SELECT n_docs, n_tokens,
               greatest(length(bin(n_tokens)) - 30, 0) AS shift,
               n_tokens >> greatest(length(bin(n_tokens)) - 30, 0) AS ls,
               n_docs >> greatest(length(bin(n_tokens)) - 30, 0) AS ns
        FROM stats
    ),
    postings AS (
        SELECT doc_id, len(ws) AS dl, w AS term,
               CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, ws, unnest(ws) AS w FROM toks)
        WHERE w IN ({term_list})
        GROUP BY 1, 2, 3
    ),
    dfs AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t
        FROM postings GROUP BY 1
    ),
    contrib AS (
        SELECT p.doc_id,
               ({ilog("(g.n_docs * 2 + 2)")} - {ilog("(p2.df_t * 2 + 1)")})
                   AS idf,
               (p.tf * 44 * {QUANT})
                   // (20 * p.tf + 6 + ((18 * p.dl * g.ns) // g.ls)) AS tfq
        FROM postings p
        JOIN dfs p2 USING (term)
        CROSS JOIN guarded g
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM((idf * tfq) // {QUANT}) AS BIGINT) AS score
    FROM contrib GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT {k}
    """
