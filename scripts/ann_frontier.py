"""Measure the ANN recall/cost frontier on the fixture embeddings.

For each config, prints recall@10 vs brute force, the distinct-candidate
fraction per query, and wall time. The GRADED configs (ann_lsh_topk's
adaptive-B ordered multi-probe, ann_ivf_kmeans_topk's sqrt-cells trained
IVF) are measured alongside the round-5 blind-probe baseline so SCALE.md
§ANN stays a measured table, not a claim.

Usage: python scripts/ann_frontier.py [sf_dir ...]
"""

import math
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from spark_on_hbase_spark.operators import similarity as V  # noqa: E402


def by_query(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall(d, brute):
    return sum(len(d.get(q, set()) & b) / len(b) for q, b in brute.items()) / len(brute)


def main():
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("ann-frontier")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
        n = emb.count()
        B = V.adaptive_num_planes(n)
        queries = emb.where(F.col("vec_id") % 97 == 0)
        nq = queries.count()
        brute = by_query(V.brute_force_topk(emb, queries, k=10))
        print(f"== {sf_dir}: n={n} queries={nq} B_auto={B}")

        # graded LSH: adaptive-B ordered multi-probe (L=6, w=10, T=224)
        t0 = time.time()
        d = by_query(
            V.lsh_margin_topk(
                emb, queries, k=10, num_planes=B, dim=64, num_tables=6,
                probe_width=10, probe_total=224, plane_pool=V.LSH_PLANE_POOL,
            )
        )
        print(
            f"  LSH margin-probe (graded)   B={B:2d} L=6 T=224 "
            f"recall={recall(d, brute):.3f} wall={time.time()-t0:.1f}s"
        )
        # round-5 baseline: blind 2-bit probing on the same pooled planes
        t0 = time.time()
        d = by_query(
            V.lsh_topk(
                emb, queries, k=10, num_planes=B, dim=64, num_tables=4,
                probe_bits=2, plane_pool=V.LSH_PLANE_POOL,
            )
        )
        print(
            f"  LSH blind 2-bit (r5 shape)  B={B:2d} L=4 p=2  "
            f"recall={recall(d, brute):.3f} wall={time.time()-t0:.1f}s"
        )

        # graded trained IVF: sqrt cells + constant candidate budget
        m = int(2 ** math.ceil(math.log2(math.sqrt(max(n, 4)))))
        nprobe = max(1, (512 + m - 1) // m)
        corpus = emb.select("vec_id", V.quantize_expr("embedding").alias("__v")).cache()
        seeds = corpus.where(F.col("vec_id") % m == 0)
        ncells = seeds.count()
        refined = V.kmeans_refine(corpus, seeds, iters=2)
        t0 = time.time()
        d = by_query(
            V.ivf_topk(
                emb, queries, refined, k=10, nprobe=nprobe, centroids_quantized=True
            )
        )
        print(
            f"  IVF trained (graded)        m={m} cells={ncells} nprobe={nprobe} "
            f"frac~{min(1.0, nprobe/max(ncells,1)):.3f} "
            f"recall={recall(d, brute):.3f} wall={time.time()-t0:.1f}s"
        )
        emb.unpersist()
        corpus.unpersist()

    # ---- clustered regime (VERDICT r6 item 6): the md5-derived clustered
    # corpus the ann_clustered_* queries grade — the regime real embedding
    # corpora live in, vs the adversarial near-random fixture above.
    N, K = 4096, 32
    emb = V.clustered_corpus(spark, N, n_clusters=K).persist()
    emb.count()
    queries = emb.where(F.col("vec_id") % 97 == 0)
    nq = queries.count()
    brute = by_query(V.brute_force_topk(emb, queries, k=10))
    B = V.adaptive_num_planes(N)
    print(f"== clustered corpus: n={N} k_clusters={K} queries={nq} B_auto={B}")
    for T in (224, 96, 48):
        kw = dict(k=10, num_planes=B, dim=64, num_tables=6, probe_width=10,
                  probe_total=T, plane_pool=V.LSH_PLANE_POOL)
        t0 = time.time()
        d = by_query(V.lsh_margin_topk(emb, queries, **kw))
        wall = time.time() - t0
        frac = (
            V.lsh_margin_topk(emb, queries, return_candidates=True, **kw).count()
            / nq / N
        )
        tag = " (graded)" if T == 96 else ""
        print(
            f"  LSH margin-probe T={T:3d}{tag:9s} recall={recall(d, brute):.3f} "
            f"frac={frac:.3f} wall={wall:.1f}s"
        )
    corpus = emb.select("vec_id", V.quantize_expr("embedding").alias("__v")).cache()
    seeds = corpus.where(F.col("vec_id") % 64 == 0)
    refined = V.kmeans_refine(corpus, seeds, iters=2)
    for label, cents, npb in (
        ("IVF seeds  nprobe=2", seeds, 2),
        ("IVF trained nprobe=1", refined, 1),
        ("IVF trained nprobe=2 (graded)", refined, 2),
    ):
        t0 = time.time()
        d = by_query(
            V.ivf_topk(emb, queries, cents, k=10, nprobe=npb,
                       centroids_quantized=True)
        )
        wall = time.time() - t0
        frac = (
            V.ivf_topk(emb, queries, cents, k=10, nprobe=npb,
                       centroids_quantized=True, return_candidates=True).count()
            / nq / N
        )
        print(
            f"  {label:30s} recall={recall(d, brute):.3f} "
            f"frac={frac:.3f} wall={wall:.1f}s"
        )
    emb.unpersist()
    corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
