"""Grading-window invariants: the correctness driver grades only the FIRST
50 registry entries per round, so registration order is part of the
contract (see inventory._ROTATED_OUT_R08)."""

from spark_on_hbase_spark.inventory import _ROTATED_OUT_R08, QUERIES

# Round-7 must-grade set (VERDICT r6 item 1 + this round's changes): every
# never-driver-graded query (the round-6 ten plus the four new round-7
# queries) and every kernel changed since its last driver grading
# (table.py dirty-compaction fixes, index.py, similarity.py).
_MUST_GRADE_R07 = {
    # round-6 new — local-mirror-green only until r07
    "secondary_index_lookup", "secondary_index_covered_lookup",
    "secondary_index_range_scan", "secondary_index_repair",
    "keyed_point_read", "streaming_indexed_upsert",
    "dup_substring_census", "decontamination_bloom",
    "kcore_peel_census", "quality_model_score",
    # round-7 new
    "secondary_index_functional_lookup", "secondary_index_skip_scan",
    "ann_clustered_lsh_topk", "ann_clustered_ivf_topk",
    "semantic_dedup_census", "dsir_importance_topk",
    # kernels changed after their r06 grading: table.py (lone-delta fold,
    # cleanup order, time travel, interval-list + string-key dirty
    # compaction), streaming ingest, the ANN family (similarity.py)
    "lsm_compaction_fold", "lsm_time_travel", "mutation_upsert_merge",
    "mutation_increment_merge", "streaming_increment_fold",
    "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_kmeans_topk",
}


def test_rotation_list_sizes_the_window_exactly():
    assert len(_ROTATED_OUT_R08) == len(QUERIES) - 50, (
        "rotated-out list must equal total-50: when adding a graded query, "
        "rotate one more freshly-green name out (inventory.py invariant note)"
    )
    assert len(set(_ROTATED_OUT_R08)) == len(_ROTATED_OUT_R08), (
        "duplicate name in the rotated-out list: a dup inflates the length "
        "check while silently shrinking the tail by one"
    )


def test_rotated_names_exist_and_sit_in_the_tail():
    names = list(QUERIES)
    tail = set(names[50:])
    for n in _ROTATED_OUT_R08:
        assert n in QUERIES, f"rotated name {n} not registered"
        assert n in tail, f"{n} listed as rotated out but inside the window"


def test_round7_must_grade_queries_are_inside_the_window():
    window = set(list(QUERIES)[:50])
    missing = _MUST_GRADE_R07 - window
    assert not missing, f"stale/new queries outside the graded window: {missing}"
