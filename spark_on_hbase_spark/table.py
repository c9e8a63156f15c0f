"""KeyedTable — the engine's mutable keyed-dataset facade.

The reference's ``HBaseTable[K]`` (HBaseTable.scala:26-41) wraps a mutable
HBase table: read via ``rdd()/select``, write via
``update/put/increment/delete/bulkUpdate/bulkLoad/bulkDelete``. HBase provides
the merge semantics (last-writer-wins by cell timestamp, tombstones, atomic
counters) for free; on immutable columnar storage we implement them as
deterministic merge writes.

Storage layout: one Parquet dataset per table, written range-partitioned and
sorted by ``key`` (``repartitionByRange + sortWithinPartitions`` — the
DataFrame twin of the reference's
``repartitionAndSortWithinPartitions(RegionPartitioner)`` bulk path,
HBaseTable.scala:242). At 100 TB the same layout holds: uniform salted keys
make range partitions balanced, sorted files give min/max zone-map pruning on
key lookups, and co-partitioned tables join without a shuffle.

Merge rules (deterministic, order-independent):
- ``update``/``put``: upsert by key; on conflict the row with the greater
  ``ts`` wins (ties broken by preferring the incoming batch) — HBase
  last-writer-wins.
- ``increment``: batch is pre-aggregated per key (map-side combine), then
  added to the stored counter — HBase atomic counters (HBaseTable.scala:157-179
  skips zero deltas; so do we).
- ``delete``: anti-join tombstones; row-level (drop key), column-level (null
  out columns) — HBaseTable.scala:181-212.
- ``bulk_*``: same semantics; single sorted rewrite (the reference's HFile
  path, HBaseTable.scala:234-294).
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KeyedTable:
    """A keyed, range-partitioned, sorted Parquet table with HBase-like
    mutation semantics. Analog of HBaseTable (HBaseTable.scala:26-41)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str = "key",
        ts_col: str = "ts",
        num_partitions: int = 32,
    ):
        self.spark = spark
        self.path = str(path)
        self.key_col = key_col
        self.ts_col = ts_col
        self.num_partitions = num_partitions

    # -- DDL (S16, HBaseAdminUtils.scala:86-214) ---------------------------

    def exists(self) -> bool:
        return Path(self.path).exists()

    def create(self, df: DataFrame) -> "KeyedTable":
        """Create the table from an initial DataFrame (pre-split into
        ``num_partitions`` sorted ranges, like the reference's pre-split
        regions, HBaseAdminUtils.scala:118)."""
        self._write(df)
        return self

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

    def add_column(self, name: str, default=None, dtype: str = "string") -> None:
        """S16 — ALTER TABLE ADD column with a default (HBaseAdminUtils.
        updateSchema adds column families, misc/HBaseAdminUtils.scala:105-143).
        One sorted rewrite; at scale this is a metadata-only op on lakehouse
        formats, and the rewrite form here keeps plain Parquet self-contained."""
        self._write(self.df().withColumn(name, F.lit(default).cast(dtype)))

    def drop_column(self, name: str) -> None:
        """S16 — ALTER TABLE DROP column (HBaseAdminUtils.dropColumnIfExists,
        misc/HBaseAdminUtils.scala:178-214)."""
        self._write(self.df().drop(name))

    def copy(self, dest: "KeyedTable") -> None:
        """S12 — scan source, re-partition to destination layout, write
        (HBaseAdminUtils.copy, misc/HBaseAdminUtils.scala:146-176)."""
        dest._write(self.df())

    # -- scan / select (S2/S3) ---------------------------------------------

    def df(self) -> DataFrame:
        """Full typed scan — HBaseTable.rdd() (HBaseTable.scala:55-65).
        Catalyst applies column pruning / predicate pushdown on top."""
        return self.spark.read.parquet(self.path)

    def select(self, *columns: str) -> DataFrame:
        """F1 semantics — see operators/scan.py:select_required."""
        from spark_on_hbase_spark.operators.scan import select_required

        return select_required(self.df(), *columns)

    # -- mutations ---------------------------------------------------------

    def update(self, batch: DataFrame) -> int:
        """Upsert whole rows by key, last-writer-wins by ``ts``
        (S5, HBaseTable.update, HBaseTable.scala:100-122).

        Returns the number of rows applied (the reference counts puts via an
        accumulator, HBaseTable.scala:127)."""
        n = batch.count()
        current = self.df()
        merged = _upsert_latest(current, batch, self.key_col, self.ts_col)
        self._write(merged)
        return n

    # the reference's bulkUpdate (S9) shares semantics with update; both end
    # in one sorted rewrite here, so bulk_update is an alias with the same
    # single-shuffle sorted write the HFile path used.
    bulk_update = update

    def put(self, batch: DataFrame) -> int:
        """Cell-level put: batch columns overwrite only the columns it
        carries, per key, last-writer-wins by ts (S6, HBaseTable.put,
        HBaseTable.scala:124-155). Columns absent from the batch keep their
        stored values."""
        current = self.df()
        missing = [c for c in current.columns if c not in batch.columns]
        enriched = batch.join(
            current.select(self.key_col, *missing), on=self.key_col, how="left"
        )
        merged = _upsert_latest(current, enriched.select(*current.columns), self.key_col, self.ts_col)
        n = batch.count()
        self._write(merged)
        return n

    bulk_load = put

    def increment(self, batch: DataFrame, counter_col: str, delta_col: str = "delta") -> int:
        """Atomic-add semantics: pre-aggregate deltas per key (map-side
        combine — the scalable form of HBase server-side increments), skip
        zero deltas (HBaseTable.scala:166), add into the stored counter
        (S7, HBaseTable.increment, HBaseTable.scala:157-179)."""
        deltas = (
            batch.where(F.col(delta_col) != 0)
            .groupBy(self.key_col)
            .agg(F.sum(delta_col).alias("__delta"))
        )
        n = deltas.count()
        current = self.df()
        merged = (
            current.join(deltas, on=self.key_col, how="left")
            .withColumn(
                counter_col,
                F.coalesce(F.col(counter_col), F.lit(0)) + F.coalesce(F.col("__delta"), F.lit(0)),
            )
            .drop("__delta")
        )
        self._write(merged)
        return n

    def delete(self, keys: DataFrame, columns: list[str] | None = None) -> int:
        """Row-level delete (anti-join on key) or column-level delete (null
        out the named columns for matching keys) — S8/S11,
        HBaseTable.delete (HBaseTable.scala:181-212): null qualifier set =>
        whole row, named qualifiers => those cells."""
        keys = keys.select(self.key_col).distinct()
        n = keys.count()
        current = self.df()
        if not columns:
            merged = current.join(keys, on=self.key_col, how="left_anti")
        else:
            marked = keys.withColumn("__doomed", F.lit(True))
            merged = current.join(marked, on=self.key_col, how="left")
            for c in columns:
                merged = merged.withColumn(
                    c, F.when(F.col("__doomed").isNull(), F.col(c))
                )
            merged = merged.drop("__doomed")
        self._write(merged)
        return n

    bulk_delete = delete

    # -- write path --------------------------------------------------------

    def _write(self, df: DataFrame) -> None:
        """Range-partitioned sorted rewrite with an atomic-ish swap.

        Single shuffle (repartitionByRange) + in-partition sort — the same
        physical shape as the reference's HFile bulk pipeline
        (HBaseTable.scala:242,296-352). Writes to a temp dir then swaps, so a
        failed job never corrupts the table."""
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        (
            df.repartitionByRange(self.num_partitions, F.col(self.key_col))
            .sortWithinPartitions(self.key_col)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        p = Path(self.path)
        if p.exists():
            p.rename(old)
        Path(tmp).rename(self.path)
        shutil.rmtree(old, ignore_errors=True)


def _upsert_latest(current: DataFrame, batch: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Keyed merge, greatest-``ts`` wins, incoming batch wins ties.

    Deterministic replacement for HBase's cell-timestamp conflict resolution.
    Implemented as union + one hash aggregation per key (max_by) — a single
    shuffle, no join, which is the cheapest possible merge at scale."""
    cols = current.columns
    tagged = current.select(*cols).withColumn("__src", F.lit(0)).unionByName(
        batch.select(*cols).withColumn("__src", F.lit(1))
    )
    struct_cols = [c for c in cols if c != key_col]
    # ordering key is (ts, src) only — data columns may be maps/arrays, which
    # are not orderable; max_by carries the row as an opaque value
    packed = tagged.select(
        key_col,
        F.struct(*struct_cols).alias("__row"),
        F.struct(ts_col, "__src").alias("__ord"),
    )
    latest = packed.groupBy(key_col).agg(F.max_by("__row", "__ord").alias("__row"))
    return latest.select(key_col, *[F.col(f"__row.{c}").alias(c) for c in struct_cols])
