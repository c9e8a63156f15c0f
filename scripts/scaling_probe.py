"""Scaling probe: do the most expensive graded queries scale linearly?

A flat sf0.1 bench can hide a driver-side or super-linear bottleneck that
only bites at cluster scale. This probe times each target query at sf0.1
and at a ~REPLICAS x key-shifted replica of sf0.1 (built once under /tmp,
the same scratch root the KeyedTable fixtures use), and reports the
time-growth : data-growth ratio. Healthy distributed plans stay at or
under ~1.5x the data growth on local[32]; a ratio far above that means a
hidden global sort, driver collect, or quadratic candidate blowup.

Key shifting keeps the workload's STRUCTURE scaling, not just its bytes:
supplier/part keys shift per replica so the derived graph gains disjoint
components (more vertices AND more frontier work), doc/vec ids shift so
dedup/ANN corpora grow without fake cross-replica duplicates.

Usage: python scripts/scaling_probe.py [replicas]   (default 10)
Writes the measured table to stdout; paste into SCALE.md §Scaling probe.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_on_hbase_spark.session import get_spark, size_driver_heap_for_launch  # noqa: E402

size_driver_heap_for_launch()

from pyspark.sql import functions as F  # noqa: E402

SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (query, data-growth driver): which replicated table dominates its input
TARGETS = [
    "ann_lsh_topk",
    "connected_components",
    "pipeline_curation_v2",
    "tfidf_keywords",
    "bsp_3step",
    "incremental_bsp_resume",
    "minhash_lsh_dedup",
]

# key shift per replica, chosen far above any real key range
_SHIFT = 10_000_000


def build_scaled(spark, replicas: int) -> str:
    out = f"/tmp/scale_probe_{os.path.basename(SMALL.rstrip('/'))}_x{replicas}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    reps = F.explode(F.array(*[F.lit(i) for i in range(replicas)])).alias("__r")

    def shifted(table: str, keys: list[str], strcols: list[str] | None = None):
        df = spark.read.parquet(f"{SMALL}/{table}.parquet").select("*", reps)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__r") * F.lit(_SHIFT))
        # make replicated text/vector content distinct too, so dedup/ANN
        # candidates do not collapse onto cross-replica exact duplicates
        for c in strcols or []:
            df = df.withColumn(
                c, F.when(F.col("__r") == 0, F.col(c)).otherwise(
                    F.concat(F.col(c), F.lit(" r"), F.col("__r"))
                )
            )
        df.drop("__r").write.mode("overwrite").parquet(f"{out}/{table}.parquet")

    shifted("lineitem", ["l_suppkey", "l_partkey", "l_orderkey"])
    shifted("supplier", ["s_suppkey"])
    shifted("documents", ["doc_id"], strcols=["text"])
    shifted("embeddings", ["vec_id"])
    for small_tbl in ["region", "nation", "customer", "part", "orders", "events"]:
        spark.read.parquet(f"{SMALL}/{small_tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{small_tbl}.parquet")
    open(os.path.join(out, "_DONE"), "w").write("ok")
    return out


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from spark_on_hbase_spark.inventory import QUERIES

    big = build_scaled(spark, replicas)
    results: dict[str, dict[str, float]] = {n: {} for n in TARGETS}
    # all small-scale runs first, then all big-scale: the shared memoized
    # relations (network, shingles, LSH corpus) are keyed by sf_dir and
    # evict when it changes, so alternating scales would rebuild every time
    for label, sf in (("small", SMALL), ("big", big)):
        for name in TARGETS:
            # cold includes building the memoized relations at this scale;
            # warm is the steady-state kernel
            t0 = time.time()
            QUERIES[name].fn(spark, sf).count()
            cold = time.time() - t0
            t0 = time.time()
            QUERIES[name].fn(spark, sf).count()
            warm = time.time() - t0
            results[name][f"{label}_cold"] = cold
            results[name][f"{label}_warm"] = warm
            print(f"  {name} @{label}: cold {cold:.2f}s warm {warm:.2f}s", flush=True)

    print()
    print(f"| query | sf0.1 cold/warm (s) | x{replicas} cold/warm (s) | "
          f"cold growth | warm growth | verdict (<= {1.5 * replicas:.0f}x) |")
    print("|---|---|---|---|---|---|")
    for name in TARGETS:
        r = results[name]
        gc = r["big_cold"] / max(r["small_cold"], 1e-9)
        gw = r["big_warm"] / max(r["small_warm"], 1e-9)
        ok = "OK" if min(gc, gw) <= 1.5 * replicas else "SUPER-LINEAR"
        print(
            f"| {name} | {r['small_cold']:.2f} / {r['small_warm']:.2f} "
            f"| {r['big_cold']:.2f} / {r['big_warm']:.2f} "
            f"| {gc:.1f}x | {gw:.1f}x | {ok} |"
        )


if __name__ == "__main__":
    main()
