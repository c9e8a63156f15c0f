"""Grading-window invariants: the correctness driver grades only the FIRST
50 registry entries per round, so registration order is part of the
contract (see inventory._ROTATED_OUT_R06)."""

from spark_on_hbase_spark.inventory import _ROTATED_OUT_R06, QUERIES

# Round-6 must-grade set (VERDICT r5 item 2 + this round's changes): every
# kernel changed after its last driver grading, the remaining r03-graded
# names, and the queries the round-6 work touched. After this round every
# registry query's most recent driver row is r04 or newer.
_MUST_GRADE_R06 = {
    # changed in round 5 after their last grading
    "tfidf_keywords", "text_repetition", "pipeline_curation_v2",
    "cohort_retention", "event_volume_anomaly", "image_near_dup_census",
    # last driver row is r03
    "hll_rollup_union", "lsm_time_travel", "zorder_cluster_stats",
    "triangle_count", "pagerank_5iter", "pool_count", "text_lang_id",
    # changed in round 6: adaptive-B ordered multi-probe LSH, adaptive
    # cells/nprobe IVF, the new foreachBatch streaming query, and the
    # mutation family over the stamped-layer / range-scoped-compaction
    # table changes
    "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_kmeans_topk",
    "streaming_increment_fold", "mutation_increment_merge",
    "mutation_upsert_merge", "lsm_compaction_fold", "simhash_dedup",
}


def test_rotation_list_sizes_the_window_exactly():
    assert len(_ROTATED_OUT_R06) == len(QUERIES) - 50, (
        "rotated-out list must equal total-50: when adding a graded query, "
        "rotate one more freshly-green name out (inventory.py invariant note)"
    )
    assert len(set(_ROTATED_OUT_R06)) == len(_ROTATED_OUT_R06), (
        "duplicate name in the rotated-out list: a dup inflates the length "
        "check while silently shrinking the tail by one"
    )


def test_rotated_names_exist_and_sit_in_the_tail():
    names = list(QUERIES)
    tail = set(names[50:])
    for n in _ROTATED_OUT_R06:
        assert n in QUERIES, f"rotated name {n} not registered"
        assert n in tail, f"{n} listed as rotated out but inside the window"


def test_round6_must_grade_queries_are_inside_the_window():
    window = set(list(QUERIES)[:50])
    missing = _MUST_GRADE_R06 - window
    assert not missing, f"stale/new queries outside the graded window: {missing}"
