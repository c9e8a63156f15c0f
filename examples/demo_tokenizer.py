"""Tokenizer + curation demo: learn a BPE merge table over a corpus
(Sennrich et al. 2016 — the word-type census is the only corpus-sized
pass), tokenize by broadcast segmentation map, then run the curation
gates of the round — C4 heuristic rules, CCNet perplexity buckets — and
print the surviving per-language token mass.

    python examples/demo_tokenizer.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from spark_on_hbase_spark import get_spark
from spark_on_hbase_spark.operators import text as T


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo-tokenizer")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. learn merges: census once, then vocab-sized rounds
    merges, seqs = T.bpe_learn(docs, k=10)
    print("learned merges (step, a, b, weighted count):")
    for m in merges:
        print("   ", m)

    # 2. tokenize by broadcast word-type map
    census = T.bpe_token_counts(docs, seqs)
    stats = census.agg(
        F.sum("n_words").alias("words"), F.sum("n_bpe_tokens").alias("bpe_tokens")
    ).collect()[0]
    print(f"corpus: {stats['words']} words -> {stats['bpe_tokens']} BPE tokens")

    # 3. CCNet buckets over the LM scores (head = most corpus-like third)
    lm = T.bigram_lm(docs)
    langs = T.lang_id(docs.select("doc_id", "text")).select(
        "doc_id", "text", "pred_lang"
    )
    buckets = T.ccnet_perplexity_buckets(langs, lm)
    print("CCNet buckets:")
    buckets.groupBy("pred_lang", "bucket").count().orderBy(
        "pred_lang", "bucket"
    ).show()

    # 4. C4 rules need line structure; the corpus is one line per doc, so
    #    every doc fails the 5-retained-lines floor — demonstrate on a
    #    constructed page instead
    page = spark.createDataFrame(
        [
            (1, "\n".join(f"sentence number {i} ends properly." for i in range(6))),
            (2, "no punctuation here\nlorem ipsum dolor."),
        ],
        "doc_id bigint, text string",
    )
    print("C4 verdicts on constructed pages:")
    T.c4_rules(page).show(truncate=False)

    # 5. the unigram-LM (SentencePiece) pairing: learn the vocabulary by
    #    fixed-point lattice EM, then tokenize by log-domain Viterbi —
    #    both sides of what bpe_learn/bpe_token_counts do for merges
    census = T.unigram_census(docs).localCheckpoint(eager=False)
    vocab = T.unigram_learn(docs, census=census)
    print("top learned unigram pieces (multi-char, by expected count):")
    vocab.where("piece_len > 1").orderBy(
        F.col("cnt_ppm").desc()
    ).show(10, truncate=False)
    toks = T.unigram_token_counts(
        docs, vocab.select("piece", "p_fp"), census=census
    )
    stats = toks.agg(
        F.sum("n_tok").alias("tokens"), F.count("*").alias("pieces_used")
    ).collect()[0]
    print(
        f"Viterbi tokenization: {stats['tokens']} tokens over "
        f"{stats['pieces_used']} distinct pieces"
    )
    spark.stop()


if __name__ == "__main__":
    main()
