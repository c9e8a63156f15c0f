"""Measure the ANN recall/cost frontier on the fixture embeddings.

For each candidate config, prints recall@10 vs brute force and the mean
candidate fraction per query (distinct scored candidates / corpus). Used to
pick the graded ann_lsh_topk / ann_ivf_kmeans_topk configs; results land in
SCALE.md §ANN.

Usage: python scripts/ann_frontier.py [sf_dir ...]
"""

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


def lsh_candidate_fraction(emb, queries, n, **kw):
    """Distinct (query, candidate) pairs scored / (|Q| * n)."""
    tables = V.pooled_table_planes(kw["num_tables"], kw["num_planes"], 64, V.LSH_PLANE_POOL)
    q = queries.select(F.col("vec_id").alias("query_id"), V.quantize_expr("embedding").alias("__qv"))
    qb = q.select("query_id", V._table_bucket_rows(F.col("__qv"), tables).alias("__tb")).select(
        "query_id", "__tb.__t", "__tb.__bucket"
    )
    from itertools import combinations

    masks = [0]
    for r in range(1, kw["probe_bits"] + 1):
        masks += [sum(1 << b for b in bits) for bits in combinations(range(kw["num_planes"]), r)]
    qb = qb.select(
        "query_id", "__t", F.explode(F.array(*[F.lit(m).cast("bigint") for m in masks])).alias("__m"), "__bucket"
    ).select("query_id", "__t", F.col("__bucket").bitwiseXOR(F.col("__m")).alias("__bucket"))
    cb = V.lsh_bucket(emb, kw["num_planes"], 64, num_tables=kw["num_tables"], plane_pool=V.LSH_PLANE_POOL)
    pairs = (
        qb.join(cb.select("vec_id", "__t", "__bucket"), ["__t", "__bucket"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
        .count()
    )
    nq = queries.count()
    return pairs / (nq * n)


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
        queries = emb.where(F.col("vec_id") % 97 == 0)
        nq = queries.count()
        brute = by_query(V.brute_force_topk(emb, queries, k=10))
        print(f"== {sf_dir}: n={n} queries={nq} B_rule(-1)={V.adaptive_num_planes(n)}")

        for name, kw in [
            ("pool B=auto(-1) L=4 p=2", dict(num_planes=V.adaptive_num_planes(n), num_tables=4, probe_bits=2)),
            ("pool B=auto(0)  L=8 p=2", dict(num_planes=V.adaptive_num_planes(n, offset=0), num_tables=8, probe_bits=2)),
            ("pool B=auto(0)  L=4 p=2", dict(num_planes=V.adaptive_num_planes(n, offset=0), num_tables=4, probe_bits=2)),
            ("pool B=auto(-1) L=8 p=2", dict(num_planes=V.adaptive_num_planes(n), num_tables=8, probe_bits=2)),
        ]:
            t0 = time.time()
            d = by_query(
                V.lsh_topk(emb, queries, k=10, dim=64, plane_pool=V.LSH_PLANE_POOL, **kw)
            )
            wall = time.time() - t0
            frac = lsh_candidate_fraction(emb, queries, n, **kw)
            print(
                f"  LSH {name:26s} B={kw['num_planes']:2d} recall={recall(d, brute):.3f} "
                f"frac={frac:.3f} wall={wall:.1f}s"
            )

        corpus = emb.select("vec_id", V.quantize_expr("embedding").alias("__v")).cache()
        seeds = corpus.where(F.col("vec_id") % 101 == 0)
        ncells = seeds.count()
        refined = V.kmeans_refine(corpus, seeds, iters=2)
        qs = corpus.where(F.col("vec_id") % 97 == 0)
        for nprobe in (2, 3, 4, 5):
            t0 = time.time()
            d = by_query(
                V.ivf_topk(
                    emb, emb.where(F.col("vec_id") % 97 == 0), refined, k=10,
                    nprobe=nprobe, centroids_quantized=True,
                )
            )
            wall = time.time() - t0
            print(
                f"  IVF trained nprobe={nprobe} cells={ncells} recall={recall(d, brute):.3f} "
                f"frac~{nprobe/ncells:.3f} wall={wall:.1f}s"
            )
        emb.unpersist()
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
