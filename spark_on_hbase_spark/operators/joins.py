"""Joins (SURVEY.md §2.3, J1-J6).

The reference's signature capability: join an RDD against the HBase table in
a single stage regardless of partitioners, by turning the join into
executor-side multiget point lookups (HBaseJoinMultiGet,
HBaseRDDFunctions.scala:121-198) or a sorted merge scan (HBaseJoinRangeScan,
:200-268). Spark-first, the same intent maps to:

- small probe side  -> broadcast join (probe ships to the table's executors;
  the big table never shuffles — exactly the multiget pattern),
- both sides big    -> sort-merge join; with both tables stored
  range-partitioned and sorted by key (KeyedTable layout) AQE's shuffle
  elimination / storage-partitioned joins keep it cheap,
- strategy choice   -> AQE at runtime, replacing the reference's hardcoded
  MultiGet(1000) (join dispatch, HBaseRDDFunctions.scala:77-84 — per-op
  estimation was an acknowledged TODO there; Catalyst actually does it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def lookup_join(
    table: DataFrame,
    probe: DataFrame,
    on: str | list[str],
    how: str = "inner",
    broadcast_probe: bool = True,
) -> DataFrame:
    """J1/J3 — point-lookup join of a probe set against the big keyed table.

    Inner semantics drop probe keys absent from the table, like the
    reference's multiget merge (HBaseRDDFunctions.scala:187). Broadcasting
    the probe reproduces "the big table does not move": each table partition
    receives the whole (small) probe and performs local hash lookups — the
    DataFrame twin of 1000-key multiget batches. With ``broadcast_probe=False``
    AQE picks the strategy (J3's envisioned size-based choice)."""
    right = broadcast(probe) if broadcast_probe else probe
    return right.join(table, on=on, how=how)


def right_outer_lookup_join(table: DataFrame, probe: DataFrame, on: str | list[str]) -> DataFrame:
    """J5 — every probe row survives; table side null when missing
    (rdd.rightOuterJoin, HBaseRDDFunctions.scala:86-94).

    Spark cannot broadcast the PRESERVED side of an outer join (a
    ``broadcast(probe)`` hint on ``table.join(probe, "right")`` is silently
    dropped and the plan degrades to shuffling the whole table — the exact
    failure mode J1 exists to avoid). The scalable decomposition: broadcast
    INNER join for the matches (table streams in place), then union the
    unmatched probe rows null-filled — found with a second key-pruned scan
    anti-joined against the broadcast matched-key set. Two pruned scans,
    the table itself is NEVER shuffled (pinned in tests/test_plans.py)."""
    keys = [on] if isinstance(on, str) else list(on)
    inner = table.join(broadcast(probe), on=on, how="inner")
    # The matched-key set MUST be deduplicated before broadcasting: it is
    # derived table-side, so with duplicate join keys in the table it would
    # otherwise grow with the table, not the probe — at 100 TB that bursts
    # the broadcast limit. dropDuplicates costs one exchange, but of the key
    # projection only, partially deduped map-side, so the shuffled volume
    # and the broadcast are both bounded by |distinct probe keys|.
    matched_keys = (
        table.select(*keys)
        .join(broadcast(probe.select(*keys)), on=keys, how="left_semi")
        .dropDuplicates(keys)
    )
    unmatched = probe.join(broadcast(matched_keys), on=keys, how="left_anti")
    filled = unmatched.select(
        *unmatched.columns,
        *[
            F.lit(None).cast(table.schema[c].dataType).alias(c)
            for c in table.columns
            if c not in keys
        ],
    )
    return inner.unionByName(filled)


def fill_join(
    table: DataFrame,
    partial: DataFrame,
    on: str,
    fill_cols: dict[str, str],
) -> DataFrame:
    """J6 — memoized lookup join ("fill"): rows whose value is already
    present pass through untouched; only missing values are looked up
    (HBaseLookupMultiGet, HBaseRDDFunctions.scala:278-343 — used by iterative
    algorithms to avoid re-fetching state).

    ``fill_cols`` maps column-in-partial -> column-in-table. Expressed as a
    left join + coalesce: Catalyst scans the table once; rows already filled
    keep their value. (The reference's 1-arg ``fill`` overload at
    HBaseRDDFunctions.scala:96 is an infinite self-recursion bug — fixed here
    by construction.)"""
    lookup = table.select(
        on, *[F.col(src).alias(f"__lk_{dst}") for dst, src in fill_cols.items()]
    )
    out = partial.join(lookup, on=on, how="left")
    for dst in fill_cols:
        out = out.withColumn(dst, F.coalesce(F.col(dst), F.col(f"__lk_{dst}")))
    return out.drop(*[f"__lk_{dst}" for dst in fill_cols])


def join_repartitioned(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    num_partitions: int = 32,
) -> DataFrame:
    """J4 — join, then re-range-partition the result to the keyed-table
    layout (rdd.join(other, partitioner), HBaseRDDFunctions.scala:72-74):
    the shape used before writing join output back to a KeyedTable, so the
    write needs no extra shuffle."""
    cols = [on] if isinstance(on, str) else list(on)
    return left.join(right, on=on, how=how).repartitionByRange(num_partitions, *cols)


def semi_join(table: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """F11's ``limit`` / J11's id-restriction, as a proper left-semi join
    (the reference approximates it with inner join + project,
    AGraph.scala:49-51)."""
    return table.join(keys, on=on, how="left_semi")


def anti_join(table: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """Anti-join — the delete-merge / unknown-words shape
    (HGraphTable.remove, HGraphTable.scala:127-135; README.md:146-159
    spell-check tutorial)."""
    return table.join(keys, on=on, how="left_anti")


def merge_join(left: DataFrame, right: DataFrame, on: str | list[str], how: str = "inner") -> DataFrame:
    """J2 — sort-merge join of two big keyed datasets (HBaseJoinRangeScan,
    HBaseRDDFunctions.scala:200-268 walks sorted iterators in lockstep).
    Spark's SMJ is the same algorithm; the hint pins it for the case both
    sides are large pre-sorted tables."""
    return left.hint("merge").join(right, on=on, how=how)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Point-in-time (as-of backward) join: every left row is paired with the
    single right row having the greatest ``right_ts <= left_ts`` for the same
    key; left rows with no prior right row keep nulls. The operator the
    reference's cell-timestamp model implies but never ships (its time-range
    filter, HBaseRDDFunctions.scala:39-46, can bound a scan but cannot pick
    "latest state as of each probe time"), and the workhorse of
    point-in-time-correct feature lookup in training pipelines.

    Spark-first: tag the sides, union, and run ONE window
    (``last(..., ignorenulls) over (key ORDER BY ts, side ROWS UNBOUNDED
    PRECEDING)``) — a single shuffle on the key, no range self-join blow-up,
    no UDF. At equal timestamps the right row sorts first, so ``<=``
    semantics hold exactly. Right rows should be unique per (key, ts) —
    pre-aggregate otherwise (ties would be resolved by input order).

    At 100 TB: one hash-partitioned sort per side — same shuffle class as
    any SMJ; a celebrity key concentrates only ITS OWN rows (bounded by that
    key's event history, not the table), and the window needs no full
    materialization (running ``last`` over a sorted stream).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    overlap = [c for c in payload if c in left.columns]
    if overlap:
        raise ValueError(f"right payload columns collide with left: {overlap}")

    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *payload,
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns if c not in keys],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in keys],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).select(
        *keys,
        "__side",
        *[f"__l_{c}" for c in left.columns if c not in keys],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return filled.where(F.col("__side") == 1).select(
        *keys,
        *[F.col(f"__l_{c}").alias(c) for c in left.columns if c not in keys],
        *payload,
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Interval (range) join: pair every left row with every right interval
    containing its timestamp — ``start <= ts < end``. Another operator class
    the reference lacks entirely (SURVEY.md §2.3 "not present"), and one
    Spark's planner would otherwise execute as a broadcast-nested-loop over
    the raw inequality.

    Scale pattern: bucketize time into fixed bins — each left row keys on
    its bin, each interval explodes into the bins it covers — then a plain
    equi-join on the bin plus the exact residual predicate. The O(n·m)
    nested loop becomes a shuffle join whose fanout is bounded by
    (interval length / bin width + 1) per interval; pick ``bin_seconds``
    near the typical interval length so that factor stays ~2.

    Intervals are half-open; empty intervals (end <= start) match nothing.
    Left/right column names must be disjoint.

    Timestamps may be TIMESTAMP or TIMESTAMP_NTZ: binning goes through
    ``cast("timestamp")`` (a no-op for TIMESTAMP, a lossless reinterpretation
    for NTZ) so both dtypes bin consistently — ``unix_micros`` alone rejects
    NTZ inputs.
    """
    overlap = sorted(set(left.columns) & set(right.columns))
    if overlap:
        raise ValueError(f"left/right columns collide: {overlap}")
    width = int(bin_seconds) * 1_000_000

    def _micros(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    l = left.withColumn(
        "__bin", F.floor(_micros(left_ts) / F.lit(width)).cast("bigint")
    )
    r = right.where(F.col(end_col) > F.col(start_col)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_micros(start_col) / F.lit(width)).cast("bigint"),
                F.floor((_micros(end_col) - 1) / F.lit(width)).cast("bigint"),
            )
        ),
    )
    return (
        l.join(r, on="__bin", how=how)
        .where((F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) < F.col(end_col)))
        .drop("__bin")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: celebrity keys on the big side are split across
    ``salt_buckets`` shuffle partitions by salting the join key; the small
    side is replicated once per bucket so every (key, salt) pair still
    meets. Result is row-identical to ``big.join(small, on, how)``.

    The storage layer already salts row keys (keys.salt_expr — the
    reference's 4-byte uniform prefix, keyspace/KeySpace.scala:36-44); this
    is the same idea applied to a single skewed JOIN key at query time, for
    when AQE's runtime skew-join splitting isn't available (disabled, or a
    non-AQE engine boundary) or the skew is known up front. Salt is
    DETERMINISTIC — md5 of ``salt_source`` (default: the key itself plus a
    per-row monotonic id would not be stable under retries, so pass a
    stable disambiguating column like an event id for perfect spread;
    key-only salting still bounds each bucket at 1/salt_buckets of the
    celebrity's rows when combined with the id default).

    Cost: small side inflates by ``salt_buckets``× (keep it broadcast-sized
    / dimension-shaped); big side is scanned once, no inflation.
    """
    if salt_source is None:
        salt_source = on
    salt = F.pmod(
        F.conv(F.substring(F.md5(F.col(salt_source).cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(salt_buckets),
    )
    b = big.withColumn("__salt", salt.cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, on=[on, "__salt"], how=how).drop("__salt")
