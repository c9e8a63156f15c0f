"""IO surface (S13 snapshot/load, S14 HTTP CSV export) and KeyedTable
schema evolution (S16 alter)."""

import urllib.request

from pyspark.sql import Row

from spark_on_hbase_spark import io as EIO
from spark_on_hbase_spark.table import KeyedTable


def test_snapshot_roundtrip_sorted(spark, tmp_path):
    df = spark.createDataFrame([Row(key=f"k{i:02d}", v=i) for i in range(40)])
    path = str(tmp_path / "snap")
    EIO.snapshot(df, path, key_col="key", num_partitions=4)
    back = EIO.load_snapshot(spark, path)
    assert sorted(r["key"] for r in back.collect()) == sorted(r["key"] for r in df.collect())


def test_http_export_serves_tsv(spark):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    srv = EIO.HttpDataFrame(df.orderBy("a"))
    try:
        body = urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/", timeout=30).read().decode()
    finally:
        srv.stop()
    lines = [ln for ln in body.splitlines() if ln]
    assert lines[0].split("\t") == ["a", "b"]
    assert lines[1].split("\t") == ["1", "x"]
    assert lines[2].split("\t") == ["2", "y"]


def test_alter_table_add_drop_column(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), num_partitions=2)
    t.create(spark.createDataFrame([Row(key="a", ts=1, v=10)]))
    t.add_column("note", default="n/a", dtype="string")
    row = t.df().collect()[0]
    assert row["note"] == "n/a"
    t.drop_column("note")
    assert "note" not in t.df().columns
