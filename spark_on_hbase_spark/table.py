"""KeyedTable — the engine's mutable keyed-dataset facade.

The reference's ``HBaseTable[K]`` (HBaseTable.scala:26-41) wraps a mutable
HBase table: read via ``rdd()/select``, write via
``update/put/increment/delete/bulkUpdate/bulkLoad/bulkDelete``. HBase gets its
mutation semantics from the LSM tree: writes append Put/Delete cells to the
memstore, flushes produce sorted HFiles, reads merge all files resolving by
cell timestamp, and compaction folds the layers back together.

This table re-expresses that **same LSM design on columnar storage**:

- layout: ``<path>/base-NNNNNN`` plus ordered ``<path>/delta-NNNNNN`` dirs,
  every layer range-partitioned and sorted by key (the HFile invariant;
  ``repartitionByRange + sortWithinPartitions`` is the DataFrame twin of the
  reference's HFile bulk pipeline, HBaseTable.scala:242,296-352);
- ``update``/``put``/``bulk_*``: append ONE sorted delta layer — O(batch)
  write, the table is never rewritten (the reference's bulkUpdate intent);
- ``delete``: a delta of tombstone rows (HBase Delete cells);
- reads: merge base ∪ deltas, last-writer-wins by (ts, layer-seq) — greater
  cell timestamp wins, ties go to the later layer, tombstones drop the key —
  exactly HBase's read-path resolution;
- ``compact()``: fold all layers into a fresh base (HBase major compaction);
  triggered automatically when the delta stack exceeds ``compact_threshold``
  so read fan-in stays bounded;
- ``increment``: eager read-modify-write of the merged view into a new base,
  matching HBase's server-side atomic increments (which are also
  read-modify-write, HBaseTable.scala:157-179); deltas can't express
  additive merges in a last-writer-wins log.

At 100 TB: mutations cost the size of the batch, not the table; reads prune
both base and deltas by key range (sorted files => zone maps); compaction is
the only table-sized job, and it is one repartitionByRange + sort — the same
single-shuffle shape as the reference's HFile load.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOMBSTONE = "__tombstone"


class KeyedTable:
    """A keyed, range-partitioned, sorted, log-structured Parquet table with
    HBase-like mutation semantics. Analog of HBaseTable (HBaseTable.scala:26-41)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str = "key",
        ts_col: str = "ts",
        num_partitions: int = 32,
        compact_threshold: int = 8,
    ):
        self.spark = spark
        self.path = str(path)
        self.key_col = key_col
        self.ts_col = ts_col
        self.num_partitions = num_partitions
        self.compact_threshold = compact_threshold

    # -- layer bookkeeping -------------------------------------------------

    def _layers(self) -> list[Path]:
        root = Path(self.path)
        if not root.exists():
            return []
        return sorted(
            p for p in root.iterdir()
            if p.name.startswith(("base-", "delta-")) and not p.name.endswith(".tmp")
        )

    def _next_seq(self) -> int:
        layers = self._layers()
        return 1 + max((int(p.name.split("-")[1]) for p in layers), default=-1)

    def _write_layer(self, df: DataFrame, kind: str) -> int:
        """Write one sorted layer atomically (write to .tmp, rename).
        Returns rows written, observed inside the write job (A16 accumulator
        parity) — the observe node sits ABOVE the range exchange, so the
        sampling pass repartitionByRange runs to pick bounds does not
        double-count."""
        name = f"{kind}-{self._next_seq():06d}"
        target = Path(self.path) / name
        tmp = target.with_suffix(".tmp")
        if _TOMBSTONE not in df.columns:
            df = df.withColumn(_TOMBSTONE, F.lit(False))
        out = df.repartitionByRange(
            self.num_partitions, F.col(self.key_col)
        ).sortWithinPartitions(self.key_col)
        out, obs = _observed_count(out)
        out.write.mode("overwrite").parquet(str(tmp))
        tmp.rename(target)
        return int(obs.get["n"])

    def _replace_all_layers(self, df: DataFrame) -> None:
        """Materialize ``df`` as the sole base layer and drop every old
        layer (major compaction / eager rewrite)."""
        df = df.localCheckpoint()  # sever lineage from the files being removed
        old = self._layers()
        self._write_layer(df, "base")
        for p in old:
            shutil.rmtree(p, ignore_errors=True)

    # -- DDL (S16, HBaseAdminUtils.scala:86-214) ---------------------------

    def exists(self) -> bool:
        return bool(self._layers())

    def create(self, df: DataFrame) -> "KeyedTable":
        """Create the table from an initial DataFrame (pre-split into
        ``num_partitions`` sorted ranges, like the reference's pre-split
        regions, HBaseAdminUtils.scala:118)."""
        Path(self.path).mkdir(parents=True, exist_ok=True)
        self._write_layer(df, "base")
        return self

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

    def copy(self, dest: "KeyedTable") -> None:
        """S12 — scan source, re-partition to destination layout, write
        (HBaseAdminUtils.copy, misc/HBaseAdminUtils.scala:146-176)."""
        Path(dest.path).mkdir(parents=True, exist_ok=True)
        dest._replace_all_layers(self.df())

    def add_column(self, name: str, default=None, dtype: str = "string") -> None:
        """S16 — ALTER TABLE ADD column with a default (HBaseAdminUtils.
        updateSchema, misc/HBaseAdminUtils.scala:105-143). Compacts so every
        layer shares the new schema."""
        self._replace_all_layers(self.df().withColumn(name, F.lit(default).cast(dtype)))

    def drop_column(self, name: str) -> None:
        """S16 — ALTER TABLE DROP column (HBaseAdminUtils.dropColumnIfExists,
        misc/HBaseAdminUtils.scala:178-214)."""
        self._replace_all_layers(self.df().drop(name))

    # -- scan / select (S2/S3) ---------------------------------------------

    def df(self) -> DataFrame:
        """Full typed scan — HBaseTable.rdd() (HBaseTable.scala:55-65): merge
        base ∪ deltas with last-writer-wins-by-(ts, layer) resolution and
        tombstone filtering — HBase's read path over HFiles. Catalyst column
        pruning / predicate pushdown apply per layer underneath the merge."""
        layers = self._layers()
        if not layers:
            raise FileNotFoundError(f"no table at {self.path}")
        frames = [self.spark.read.parquet(str(p)) for p in layers]
        if len(frames) == 1:
            merged = frames[0]
        else:
            merged = _merge_layers(frames, self.key_col, self.ts_col)
        if _TOMBSTONE in merged.columns:
            merged = merged.where(~F.col(_TOMBSTONE)).drop(_TOMBSTONE)
        return merged

    def select(self, *columns: str) -> DataFrame:
        """F1 semantics — see operators/scan.py:select_required."""
        from spark_on_hbase_spark.operators.scan import select_required

        return select_required(self.df(), *columns)

    # -- mutations ---------------------------------------------------------

    def update(self, batch: DataFrame) -> int:
        """Upsert whole rows by key, last-writer-wins by ``ts`` (S5,
        HBaseTable.update, HBaseTable.scala:100-122): ONE appended delta
        layer — O(batch), the table is not rewritten. Returns rows applied
        (the reference's put accumulator, HBaseTable.scala:127) — observed
        inside the write job (see _write_layer), not a second pass."""
        n = self._write_layer(batch, "delta")
        self._maybe_compact()
        return n

    # S9 bulkUpdate shares semantics with update; both are one sorted layer
    # write — the HFile path made literal.
    bulk_update = update

    def put(self, batch: DataFrame) -> int:
        """Cell-level put (S6, HBaseTable.put, HBaseTable.scala:124-155):
        batch columns overwrite, columns absent from the batch keep stored
        values. HBase stores per-cell puts natively; on whole-row layers the
        absent columns are filled from the current merged view, then the row
        appends as a delta — still O(batch) written, one table scan read."""
        current = self.df()
        missing = [c for c in current.columns if c not in batch.columns]
        enriched = batch.join(
            current.select(self.key_col, *missing), on=self.key_col, how="left"
        ).select(*current.columns)
        n = self._write_layer(enriched, "delta")
        self._maybe_compact()
        return n

    bulk_load = put

    def increment(self, batch: DataFrame, counter_col: str, delta_col: str = "delta") -> int:
        """Atomic-add semantics (S7, HBaseTable.increment,
        HBaseTable.scala:157-179): pre-aggregate deltas per key (map-side
        combine), skip zero deltas (:166), add into the stored counter.
        Eager read-modify-write (HBase increments are too): additive merges
        cannot ride a last-writer-wins delta log."""
        deltas = (
            batch.where(F.col(delta_col) != 0)
            .groupBy(self.key_col)
            .agg(F.sum(delta_col).alias("__delta"))
        )
        deltas, obs = _observed_count(deltas)
        merged = (
            self.df()
            .join(deltas, on=self.key_col, how="left")
            .withColumn(
                counter_col,
                F.coalesce(F.col(counter_col), F.lit(0)) + F.coalesce(F.col("__delta"), F.lit(0)),
            )
            .drop("__delta")
        )
        self._replace_all_layers(merged)
        return int(obs.get["n"])

    def delete(self, keys: DataFrame, columns: list[str] | None = None) -> int:
        """Row-level delete -> tombstone delta rows (HBase Delete cells);
        column-level delete -> delta rows with the named cells nulled
        (S8/S11, HBaseTable.delete, HBaseTable.scala:181-212: null qualifier
        set => whole row, named qualifiers => those cells)."""
        keys = keys.select(self.key_col).distinct()
        current = self.df()
        # precedence comes from the layer sequence (later layer wins ts
        # ties), so tombstones/cell-nulls carry the original ts unchanged
        if not columns:
            doomed = current.join(keys, on=self.key_col, how="left_semi")
            n = self._write_layer(doomed.withColumn(_TOMBSTONE, F.lit(True)), "delta")
        else:
            marked = current.join(keys, on=self.key_col, how="left_semi")
            for c in columns:
                marked = marked.withColumn(c, F.lit(None).cast(dict(current.dtypes)[c]))
            n = self._write_layer(marked, "delta")
        self._maybe_compact()
        return n

    bulk_delete = delete

    # -- compaction --------------------------------------------------------

    def _maybe_compact(self) -> None:
        if len(self._layers()) > self.compact_threshold:
            self.compact()

    def compact(self) -> None:
        """Major compaction: fold base ∪ deltas into one sorted base layer
        (HBase major compaction; the reference's HFile bulk pipeline shape,
        HBaseTable.scala:296-352). Tombstoned keys are physically removed."""
        self._replace_all_layers(self.df())


def _observed_count(df: DataFrame):
    """Attach a row-count observation to ``df`` — the engine's twin of the
    reference's write-path accumulators (A16, HBaseTable.scala:127,137,168):
    the count is collected DURING the write job by the observe operator, so
    mutations report rows applied without a second pass over the batch (or,
    for deletes, over the table). Returns (observed_df, Observation); read
    ``obs.get["n"]`` after the write action."""
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, F.count(F.lit(1)).alias("n")), obs


def _merge_layers(frames: list[DataFrame], key_col: str, ts_col: str) -> DataFrame:
    """Merge ordered layers, last-writer-wins by (ts, layer-seq).

    One union + one max_by aggregation per key — a single shuffle, no join:
    the cheapest merge shape at scale. The ordering key is (ts, seq) only;
    data columns ride as an opaque struct (maps/arrays are not orderable)."""
    tagged = None
    for seq, f in enumerate(frames):
        if _TOMBSTONE not in f.columns:
            f = f.withColumn(_TOMBSTONE, F.lit(False))
        t = f.withColumn("__seq", F.lit(seq))
        tagged = t if tagged is None else tagged.unionByName(t)
    cols = [c for c in tagged.columns if c != "__seq"]
    struct_cols = [c for c in cols if c != key_col]
    packed = tagged.select(
        key_col,
        F.struct(*struct_cols).alias("__row"),
        F.struct(ts_col, "__seq").alias("__ord"),
    )
    latest = packed.groupBy(key_col).agg(F.max_by("__row", "__ord").alias("__row"))
    return latest.select(key_col, *[F.col(f"__row.{c}").alias(c) for c in struct_cols])


def _upsert_latest(current: DataFrame, batch: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Keyed merge of two relations, greatest-``ts`` wins, incoming batch
    wins ties — the two-layer case of ``_merge_layers``, exposed for
    read-only merge pipelines (inventory_misc.mutation_upsert_merge)."""
    merged = _merge_layers(
        [current.select(*current.columns), batch.select(*current.columns)], key_col, ts_col
    )
    if _TOMBSTONE not in current.columns:
        merged = merged.drop(_TOMBSTONE)
    return merged