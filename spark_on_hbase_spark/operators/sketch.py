"""Count-min sketch: fixed-size frequency estimation over unbounded key
universes — the third sketch family beside HLL distinct counts and
Greenwald-Khanna quantiles (operators/agg.py). A 100 TB stream of tokens /
user ids / URLs cannot keep one exact counter per key; the CMS keeps
``depth x width`` counters (kilobytes) with the one-sided guarantee
``estimate >= true`` and error bounded by total_mass / width per row.

Engine shape: building the sketch is ONE hash aggregation over
(row, bucket) — map-side partial aggregation shrinks every task's
contribution to at most depth*width rows before the exchange, the
definition of a mergeable sketch. Counter merge is elementwise addition
(commutative/associative), so partial sketches from any partitioning
combine exactly. Determinism: the hash family is md5-derived and counters
are exact integer counts, so the whole sketch — and every estimate — is
bit-identical across engines, partitionings and retries; unlike HLL/GK
there is no accuracy tolerance to gate, the DuckDB oracle reproduces the
sketch EXACTLY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(key: Column, row: int, width: int) -> Column:
    """Hash-family member ``row``: md5-salted bucket of ``key`` in
    [0, width). Independent rows come from prefixing the row index into
    the hashed string."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}:"), key)), 1, 8), 16, 10
        ).cast("bigint")
        % width
    )


def cms_bucket_sql(key_sql: str, row: int, width: int) -> str:
    """DuckDB twin of ``cms_bucket`` for SQL oracles."""
    return (
        f"CAST(('0x' || substring(md5('{row}:' || {key_sql}), 1, 8)) AS UBIGINT)"
        f" % {width}"
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the counter relation (row, bucket, c): every input occurrence
    increments one counter per hash row. One explode (depth rows per
    occurrence) + one hash aggregation; the result is depth*width rows
    regardless of input size."""
    key = F.col(key_col).cast("string")
    placed = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_bucket(key, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__rb")
    )
    return placed.groupBy(
        F.col("__rb.row").alias("row"), F.col("__rb.bucket").alias("bucket")
    ).agg(F.count("*").alias("c"))


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query the sketch: for every row of ``keys``, the minimum of
    its ``depth`` counters — the classic CMS estimate, ``>= true`` always.
    The counter relation is depth*width rows and broadcasts; keys explode
    to depth lookup rows and aggregate back with one MIN. Buckets absent
    from the counter relation are EMPTY (count 0) — the left join +
    coalesce keeps the textbook semantics: a never-seen key whose probes
    hit an empty bucket estimates 0 instead of silently vanishing (an
    inner join would drop its probes and either lose the key or overstate
    the MIN over only the colliding rows)."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_bucket(key, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__rb"),
    ).select(key_col, F.col("__rb.row").alias("row"), F.col("__rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# KMV / theta sketches: mergeable DISTINCT-count algebra WITH set operations
# ---------------------------------------------------------------------------

#: KMV hash universe: 13 md5 hex chars = 52 uniform bits. Sized so the
#: estimator numerators (k-1)*U and W*U (W <= k = 128) stay well inside
#: int64 — 127 * 2^52 ~ 5.7e17 against the 9.2e18 ceiling — because the
#: estimates divide with integer `div`/`//` (both engines truncate
#: nonnegative operands identically), never a double division whose
#: >2^53 operands would round. Hash collisions at 2^52 are ~n^2/2^53
#: (1e-4 at a million distinct keys) and affect both engines identically.
KMV_U = 1 << 52


def kmv_hash(key: Column) -> Column:
    """52-bit md5-derived hash in [0, 2^52) — the KMV order statistic."""
    return F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("bigint")


def kmv_hash_sql(key_sql: str) -> str:
    """DuckDB twin of ``kmv_hash``."""
    return f"CAST(('0x' || substring(md5({key_sql}), 1, 13)) AS BIGINT)"


def kmv_build(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 128
) -> DataFrame:
    """Per-group KMV (bottom-k / theta) sketch: the ``k`` smallest DISTINCT
    hash values of the group's keys, ranked — (group..., h, rk). Beyer et
    al. 2007 (SIGMOD), the sketch family behind the Theta algebra: unlike
    HLL it supports INTERSECTION and difference estimates, because the
    retained hashes are a uniform sample of the key universe below a
    per-group threshold.

    Engine shape: one distinct hash-agg over (group, h) — map-side partial
    dedup shrinks every task's exchange contribution — then rank <= k on
    the raw row_number, which plans WindowGroupLimit (each input partition
    forwards at most k rows per group). The sketch is k rows per group
    regardless of input size; merging sketches = union + re-rank, exactly
    this operator over the concatenated relations. Every value is an
    exact integer — the oracle reproduces the sketch bit-for-bit."""
    from pyspark.sql import Window

    key = F.col(key_col).cast("string")
    hashes = (
        df.select(*group_cols, kmv_hash(key).alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.count("*").alias("__drop"))
        .drop("__drop")
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def kmv_distinct_estimate(sketch: DataFrame, group_cols: list[str], k: int = 128) -> DataFrame:
    """Per-group distinct estimate from the sketch alone: EXACT when the
    group holds fewer than k distinct keys (the sketch IS the key set),
    else the classic (k-1) * U / h_k — all exact integer division."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("__n"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("__hk"),
    )
    est = F.when(F.col("__n") < k, F.col("__n")).otherwise(
        F.expr(f"(CAST({k - 1} AS BIGINT) * CAST({KMV_U} AS BIGINT)) div __hk")
    )
    return agg.select(*group_cols, est.alias("distinct_est"))


def kmv_intersect_pairs(
    sketch: DataFrame, group_col: str, k: int = 128
) -> DataFrame:
    """Pairwise intersection-cardinality estimates between every ordered
    pair of groups (a < b): theta = min of the two groups' thresholds
    (h_k when the sketch is full, the universe bound otherwise — a
    not-full sketch holds its ENTIRE key set), W = |shared hashes below
    theta|, est = W * U / theta. The W hashes are a uniform
    theta/U-sample of the intersection, so the estimate is unbiased; with
    both sketches not-full it degrades to the EXACT intersection count
    (theta = U). Exact integers throughout — cross-engine bit-identical.

    Cost: sketches are k rows per group; the pair join is sketch-sized
    (k x groups rows against itself on h), never touches the corpus."""
    thr = sketch.groupBy(group_col).agg(
        F.coalesce(
            F.max(F.when(F.col("rk") == k, F.col("h"))), F.lit(KMV_U)
        ).alias("__theta"),
    )
    pairs = (
        thr.select(F.col(group_col).alias("ga"), F.col("__theta").alias("__ta"))
        .crossJoin(
            thr.select(
                F.col(group_col).alias("gb"), F.col("__theta").alias("__tb")
            )
        )
        .where(F.col("ga") < F.col("gb"))
        .select(
            "ga", "gb", F.least(F.col("__ta"), F.col("__tb")).alias("__theta")
        )
    )
    shared = (
        sketch.select(F.col(group_col).alias("ga"), "h")
        .join(sketch.select(F.col(group_col).alias("gb"), "h"), "h")
        .where(F.col("ga") < F.col("gb"))
        .join(F.broadcast(pairs), ["ga", "gb"])
        .where(F.col("h") < F.col("__theta"))
        .groupBy("ga", "gb")
        .agg(F.count("*").cast("bigint").alias("__w"))
    )
    out = pairs.join(shared, ["ga", "gb"], "left").withColumn(
        "__w", F.coalesce(F.col("__w"), F.lit(0).cast("bigint"))
    )
    est = F.expr(f"(__w * CAST({KMV_U} AS BIGINT)) div __theta")
    return out.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        F.col("__w").alias("shared_below_theta"),
        est.alias("intersect_est"),
    )
