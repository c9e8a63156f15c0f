"""KeyedTable mutation semantics (SURVEY.md §2.1 S5-S12): upsert
last-writer-wins by ts, cell-level put, pre-aggregated increment, row/column
deletes, copy — the HBase behaviors re-expressed as deterministic merge
writes (table.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_on_hbase_spark.table import KeyedTable


@pytest.fixture
def table(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), key_col="key", ts_col="ts", num_partitions=4)
    df = spark.createDataFrame(
        [Row(key=f"k{i:03d}", ts=100, height=i, tag=f"v{i}") for i in range(20)]
    )
    return t.create(df)


def rows(t):
    return {r["key"]: r.asDict() for r in t.df().collect()}


def test_update_upsert_last_writer_wins(spark, table):
    batch = spark.createDataFrame(
        [
            Row(key="k001", ts=200, height=999, tag="new"),   # newer ts -> wins
            Row(key="k002", ts=50, height=-1, tag="stale"),   # older ts -> loses
            Row(key="k999", ts=100, height=42, tag="insert"),  # new key
        ]
    )
    n = table.update(batch)
    assert n == 3
    r = rows(table)
    assert len(r) == 21
    assert r["k001"]["height"] == 999 and r["k001"]["ts"] == 200
    assert r["k002"]["height"] == 2  # stale write rejected
    assert r["k999"]["tag"] == "insert"


def test_update_tie_prefers_incoming(spark, table):
    batch = spark.createDataFrame([Row(key="k003", ts=100, height=-7, tag="tie")])
    table.update(batch)
    assert rows(table)["k003"]["height"] == -7  # same ts: batch wins (HBase puts)


def test_put_preserves_missing_columns(spark, table):
    batch = spark.createDataFrame([Row(key="k004", ts=300, height=1234)])
    table.put(batch)
    r = rows(table)["k004"]
    assert r["height"] == 1234
    assert r["tag"] == "v4"  # column absent from batch keeps stored value


def test_increment_preaggregates_and_skips_zero(spark, table):
    batch = spark.createDataFrame(
        [
            Row(key="k005", delta=3),
            Row(key="k005", delta=4),   # same key pre-aggregates to +7
            Row(key="k006", delta=0),   # zero delta skipped (HBaseTable.scala:166)
            Row(key="k007", delta=-2),
        ]
    )
    n = table.increment(batch, counter_col="height")
    assert n == 2  # k005 and k007 (k006's zero delta skipped)
    r = rows(table)
    assert r["k005"]["height"] == 5 + 7
    assert r["k006"]["height"] == 6
    assert r["k007"]["height"] == 7 - 2


def test_delete_rows_and_columns(spark, table):
    doomed = spark.createDataFrame([Row(key="k008"), Row(key="k009")])
    table.delete(doomed)
    r = rows(table)
    assert "k008" not in r and "k009" not in r and len(r) == 18

    col_del = spark.createDataFrame([Row(key="k010")])
    table.delete(col_del, columns=["tag"])
    r = rows(table)
    assert r["k010"]["tag"] is None      # cell tombstone
    assert r["k010"]["height"] == 10     # other cells survive
    assert r["k011"]["tag"] == "v11"     # other rows untouched


def test_copy_roundtrip(spark, table, tmp_path):
    dest = KeyedTable(spark, str(tmp_path / "t2"), num_partitions=2)
    table.copy(dest)
    assert sorted(rows(dest)) == sorted(rows(table))


def test_updates_append_deltas_not_rewrite(spark, table):
    """LSM invariant: each mutation appends one sorted delta layer; the base
    is untouched until compaction (O(batch) writes — HBase memstore/HFile)."""
    layers_before = table._layers()
    assert len(layers_before) == 1 and layers_before[0].name.startswith("base-")
    table.update(spark.createDataFrame([Row(key="k001", ts=300, height=1, tag="d1")]))
    table.update(spark.createDataFrame([Row(key="k002", ts=300, height=2, tag="d2")]))
    layers = table._layers()
    assert len(layers) == 3
    assert layers[0] == layers_before[0]  # base unchanged
    assert all(p.name.startswith("delta-") for p in layers[1:])
    r = rows(table)
    assert r["k001"]["tag"] == "d1" and r["k002"]["tag"] == "d2"


def test_compaction_folds_layers_and_purges_tombstones(spark, table):
    table.update(spark.createDataFrame([Row(key="x1", ts=300, height=0, tag="t")]))
    table.delete(spark.createDataFrame([Row(key="x1")]))
    assert len(table._layers()) == 3
    before = rows(table)
    table.compact()
    assert len(table._layers()) == 1
    assert rows(table) == before  # logical view unchanged by compaction
    assert "x1" not in before  # tombstone purged physically and logically


def test_auto_compaction_bounds_delta_stack(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "auto"), num_partitions=2, compact_threshold=3)
    t.create(spark.createDataFrame([Row(key="a", ts=0, v=0)]))
    for i in range(1, 6):
        t.update(spark.createDataFrame([Row(key="a", ts=i, v=i)]))
    assert len(t._layers()) <= 4  # stack bounded by threshold + fresh deltas
    assert rows(t)["a"]["v"] == 5


def test_write_is_sorted_within_partitions(spark, table):
    # the bulk-write layout guarantee (HFile pipeline twin): files sorted by key
    df = table.df().select("key", F.spark_partition_id().alias("pid"))
    pdf = df.toPandas()
    for _, grp in pdf.groupby("pid"):
        keys = list(grp["key"])
        assert keys == sorted(keys)
