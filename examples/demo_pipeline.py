"""Training-data pipeline demo: the corpus-hygiene passes a 100 TB
pre-training pipeline runs, end to end on the driver testdata —
fingerprint -> exact dedup -> minhash near-dedup with CLUSTER
canonicalization -> quality gate (length + repetition) -> PII scrub ->
language ID -> embedding ANN.

    python examples/demo_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from spark_on_hbase_spark import get_spark
from spark_on_hbase_spark.operators import dedup as D
from spark_on_hbase_spark.operators import similarity as V
from spark_on_hbase_spark.operators import text as T


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text", "lang")
    n0 = docs.count()
    print(f"corpus: {n0} documents")

    # 1. fingerprint + exact dedup
    fp = T.fingerprint(docs)
    groups = D.exact_dup_groups(fp, text_col="fingerprint", id_col="doc_id")
    print("exact-dup groups:", groups.count())

    # 2. minhash near-dedup: keep the min doc_id of every near-dup pair
    shingled = docs.select(
        "doc_id", F.explode(D.shingles_expr("text", 3)).alias("shingle")
    ).localCheckpoint()
    sigs = D.minhash_signatures(shingled, "doc_id", "shingle", 12)
    bands = D.lsh_bands(sigs, "doc_id", 12, 4)
    pairs = D.candidate_pairs(bands, "doc_id")
    near = D.jaccard_verify(pairs, shingled, "doc_id", "shingle", 0.7)
    # transitive cluster canonicalization: A~B and B~C keep exactly one of
    # {A,B,C} (dropping "the id_b of every pair" would over- or under-drop)
    clusters = D.near_dup_clusters(near)
    doomed = clusters.where(F.col("doc_id") != F.col("canonical_id")).select("doc_id")
    deduped = docs.join(doomed, "doc_id", "left_anti")
    print(f"after near-dedup: {deduped.count()} (dropped {n0 - deduped.count()})")

    # 3. quality gate: length/stopword ratios + Gopher repetition signals
    scored = T.quality_score(deduped)
    rep = T.repetition_signals(deduped).select("doc_id", "dup_trigram_frac")
    kept = (
        scored.join(rep, "doc_id")
        .where(
            (F.col("n_tokens") >= 20)
            & (F.col("stop_ratio") > 0)
            & (F.col("dup_trigram_frac") < 0.1)
        )
    )
    print("after quality gate:", kept.count())

    # 3b. PII scrub: counts + typed-placeholder redaction
    scrubbed = T.pii_scrub(kept)
    n_pii = scrubbed.where(
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
    ).count()
    print("documents containing PII (redacted):", n_pii)
    pred = T.lang_id(kept.select("doc_id", "text", "lang"))
    agreement = pred.where(F.col("pred_lang") == F.col("lang")).count() / max(pred.count(), 1)
    print(f"language-ID agreement with labels: {agreement:.1%}")

    # 4. corpus assembly: balanced domain mixture -> token-budget selection
    #    -> OOV check against the corpus vocab -> sequence packing
    from spark_on_hbase_spark.operators import agg as A
    from spark_on_hbase_spark.operators import packing as P
    from spark_on_hbase_spark.operators import scan as S

    full = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mixed = S.balanced_sample(full, "lang", id_col="doc_id")
    print("after balanced language mixture:", mixed.count(), "of", full.count())
    with_tokens = mixed.select(
        "doc_id", "lang", F.size(T.words_expr("text")).alias("n_tokens"),
        F.col("text"),
    )
    vocab = T.top_vocab(full, 16)
    oov = T.oov_stats(with_tokens, vocab)
    print("mean OOV fraction vs top-16 vocab:",
          round(oov.agg(F.avg("oov_frac")).collect()[0][0], 3))
    selected = A.take_prefix_mass(
        with_tokens.drop("text"),
        [F.col("n_tokens").desc(), F.col("doc_id")], "n_tokens", 5000,
    )
    print("token-budget selection (5000 tokens):", selected.count(), "docs")
    packed = P.pack_sequences(selected, "n_tokens", budget=256, num_shards=8)
    manifest = P.packing_census(packed, "n_tokens")
    print("packed training sequences:", manifest.count())

    # 4b. LM-likelihood quality scoring + CMS frequency + chunking
    from spark_on_hbase_spark.operators import sketch as SK

    lm = T.bigram_lm(full)
    lm_scores = T.lm_likelihood(full, lm)
    print("lowest LM-likelihood docs:",
          [r["doc_id"] for r in lm_scores.orderBy("lm_score").limit(3).collect()])
    toks = full.select(F.explode(T.words_expr(F.lower(F.col("text")))).alias("token"))
    counters = SK.cms_build(toks, "token", depth=4, width=8)
    print("CMS counters:", counters.count(), "(4 rows x 8 buckets)")
    chunks = T.chunk_documents(full, chunk_tokens=32, stride=24)
    print("doc chunks for embedding:", chunks.count())

    # 4c. cross-document span (line) dedup gate + temperature mixture
    from spark_on_hbase_spark.operators import dedup as DD
    from spark_on_hbase_spark.operators import scan as SC

    spans = DD.span_dup_stats(full, span_tokens=10)
    gated = spans.where(10 * F.col("dup_spans") < 3 * F.col("n_spans"))
    print("span-dedup gate keeps:", gated.count(), "of", spans.count(), "docs")
    rebalanced = SC.temperature_mixture_sample(full, "lang", id_col="doc_id")
    print("temperature mixture (alpha=0.5) keeps:", rebalanced.count(), "docs")

    # 4d. DSIR importance resampling: rank the crawl by similarity to its
    # English slice (hashed unigram+bigram LMs, exact fixed-point log2)
    gb = T.dsir_buckets(full)
    w = T.dsir_weights_from_buckets(
        gb, full.where(F.col("lang") == "en").select("doc_id")
    )
    dsir = T.dsir_scores(None, w, buckets=gb)
    print("most target-like docs (DSIR):",
          [r["doc_id"] for r in dsir.orderBy(F.col("dsir_q").desc(), "doc_id").limit(3).collect()])

    # 5. embedding ANN over the vector table (multi-probe sign-LSH: 4
    # 8-plane tables, each query also probes its 8 single-bit bucket flips)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") % 97 == 0)
    top = V.lsh_topk(emb, queries, k=5, num_planes=8, dim=64, num_tables=4, probe_bits=1)
    print("ANN neighbors (multi-probe LSH, first query):")
    top.orderBy("query_id", "rank").show(5)


if __name__ == "__main__":
    main()
