"""Incremental curation refresh: the delta-maintained kept-set must equal
the full recompute over the post-mutation corpus, while actually taking
the delta path (stored rows pass through branch A untouched; only the
batch re-gates)."""

from pyspark.sql import functions as F

from spark_on_hbase_spark.inventory import QUERIES
from spark_on_hbase_spark.inventory_pipeline import (
    _curi_base,
    _curi_fixture,
    _v4_gate_pred,
    _v4_per_doc_frame,
)

SF = "/root/testdata/sf0.001"


def test_incremental_refresh_equals_full_recompute(spark):
    inc = QUERIES["pipeline_curation_incremental"].fn(spark, SF)
    fix = _curi_fixture(spark, SF)
    # full recompute over the POST-mutation table state — the oracle's rule
    pd = _v4_per_doc_frame(fix["tbl"].df().select("doc_id", "text"))
    g = (
        pd.groupBy("__fp")
        .agg(F.min("doc_id").alias("__canon"), F.count("*").alias("__m"))
        .where(F.col("__m") > 1)
    )
    full = (
        pd.join(F.broadcast(g), "__fp", "left")
        .where(_v4_gate_pred())
        .select(
            "doc_id",
            F.col("__n").alias("n_tokens"),
            "score_pm",
            "ent_fp",
        )
    )
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_refresh_re_gates_only_the_batch(spark):
    """The re-gate relation is O(batch): exactly the upserted docs that
    were not subsequently deleted — never a corpus pass."""
    fix = _curi_fixture(spark, SF)
    feed = fix["tbl"].changes(since_layer=fix["snap"])
    dels = feed.where(F.col("op") == "delete").select("doc_id")
    ups = (
        feed.where(F.col("op") == "upsert")
        .select("doc_id", "text")
        .join(dels, "doc_id", "left_anti")
    )
    n_base = _curi_base(spark, SF).count()
    n_regate = ups.count()
    assert 0 < n_regate < n_base / 4, (n_regate, n_base)
    # upserts are exactly the %7==2 corpus docs minus the deleted overlap
    ids = {r[0] for r in ups.collect()}
    assert all(i % 7 == 2 for i in ids)
    assert all(i % 13 != 3 for i in ids)


def test_unaffected_kept_rows_ride_the_stored_matview(spark):
    """Branch A must carry most of the kept set (the 100 TB point: the
    stored matview is reused, not recomputed): every kept doc outside the
    touched/affected sets appears identically in the stored kept matview."""
    from spark_on_hbase_spark.inventory_pipeline import _curi_kept

    fix = _curi_fixture(spark, SF)
    touched = {
        r[0]
        for r in fix["tbl"]
        .changes(since_layer=fix["snap"])
        .select("doc_id")
        .distinct()
        .collect()
    }
    inc = {
        r["doc_id"]: (r["n_tokens"], r["score_pm"], r["ent_fp"])
        for r in QUERIES["pipeline_curation_incremental"].fn(spark, SF).collect()
    }
    kept_base = {
        r["doc_id"]: (r["__n"], r["score_pm"], r["ent_fp"])
        for r in _curi_kept(spark, SF).collect()
    }
    # a touched doc legitimately changes signals (it was re-gated); the
    # stored-matview claim is about the UNTOUCHED kept rows
    carried = {
        k: v for k, v in inc.items() if k in kept_base and k not in touched
    }
    assert len(carried) > 0.5 * len(inc), (len(carried), len(inc))
    for k, v in carried.items():
        assert kept_base[k] == v
