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
