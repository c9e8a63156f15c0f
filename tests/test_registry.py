"""Grading-window invariants: the correctness driver grades only the FIRST
50 registry entries per round, so registration order is part of the
contract (see inventory._ROTATED_OUT)."""

from spark_on_hbase_spark.inventory import _ROTATED_OUT, QUERIES

# Round-11 must-grade set: the r11-new queries, the two kernels r11
# touches, and the stalest driver grades the window exists to refresh
# (VERDICT r10 item 1 — the r04 rows plus the 5 oldest r05 filter rows).
_MUST_GRADE_R11 = {
    # r11-new
    "incremental_near_dup_index",
    "pipeline_curation_incremental",
    "unigram_lm_learn",
    # kernels touched in r11
    "streaming_exact_dedup",   # ADVICE r10: batch-file mtimes pinned
    "pipeline_curation_v4",    # gate kernel factored into shared helpers
    # the named stalest grades from VERDICT r10 item 1
    "exact_dedup",
    "minhash_lsh_dedup",
    "multimodal_decode_meta",
    "scan_required_columns",
    "filter_comparison",
    "map_contains",
    "time_range_scan",
    "sample_scan",
    # the two unattributed r10 bench drifts — fresh rows settle them
    "ngram_jaccard_dedup",
    "ddl_evolution_fold",
    # late-r11 additions (Viterbi tokenize / hard negatives / Zipf fit /
    # KMV theta intersections)
    "unigram_token_census",
    "hard_negative_mining",
    "zipf_corpus_fit",
    "kmv_theta_intersection",
}

# Deferred from the r04-refresh cohort to r12 to make room for the three
# late-r11 queries; each keeps an in-window sibling grading the same kernel
# family (decode path / md5 fingerprint / MinHash-LSH machinery).
_DEFERRED_TO_R12 = [
    "multimodal_frame_sample",
    "text_fingerprint",
    "minhash_cluster_dedup",
    "embedding_cluster_dedup",
]


def test_rotation_list_sizes_the_window_exactly():
    assert len(_ROTATED_OUT) == len(QUERIES) - 50, (
        "rotated-out list must equal total-50: when adding a graded query, "
        "rotate one more freshly-green name out (inventory.py invariant note)"
    )
    assert len(set(_ROTATED_OUT)) == len(_ROTATED_OUT), (
        "duplicate name in the rotated-out list: a dup inflates the length "
        "check while silently shrinking the tail by one"
    )


def test_rotated_names_exist_and_sit_in_the_tail():
    names = list(QUERIES)
    tail = set(names[50:])
    for n in _ROTATED_OUT:
        assert n in QUERIES, f"rotated name {n} not registered"
        assert n in tail, f"{n} listed as rotated out but inside the window"


def test_round11_must_grade_queries_are_inside_the_window():
    window = set(list(QUERIES)[:50])
    missing = _MUST_GRADE_R11 - window
    assert not missing, f"stale/new queries outside the graded window: {missing}"


def test_no_window_query_grade_older_than_r04_after_rotation():
    """The r11 rotation contract: every rotated-OUT query has an r05+ driver
    row already — except the three _DEFERRED_TO_R12 names, which sit at the
    HEAD of the rotated list (first back in next round) and each have an
    in-window sibling grading the same kernel family this round."""
    _R04_COHORT = {
        "ann_brute_topk", "bucketed_smj_revenue", "cms_token_frequency",
        "csv_export_roundtrip", "ddl_evolution_fold", "decontamination_overlap",
        "doc_chunking", "domain_mixture_sample", "embedding_cluster_dedup",
        "embedding_near_dup", "event_transition_matrix", "exact_dedup",
        "f1_validation", "fixed_k_eval_sample", "grouped_topk_customers",
        "incremental_bsp_resume", "incremental_index_dedup",
        "label_propagation_2step", "length_bucket_histogram", "max_connected",
        "minhash_cluster_dedup", "minhash_lsh_dedup", "multimodal_decode_meta",
        "multimodal_frame_sample", "ngram_jaccard_dedup",
        "pipeline_corpus_curation", "prob_propagation_2step",
        "q1_pricing_summary", "sequence_packing", "span_dedup_census",
        "stratified_sample_census", "temperature_mixture_census",
        "text_fingerprint", "text_pii_scrub", "text_quality",
        "text_rolling_fingerprint", "text_token_stats",
        "token_budget_selection", "vocab_oov_rate", "vocab_top_terms",
    }
    window = set(list(QUERIES)[:50])
    assert (_R04_COHORT - set(_DEFERRED_TO_R12)) <= window, sorted(
        (_R04_COHORT - set(_DEFERRED_TO_R12)) - window
    )
    assert _ROTATED_OUT[: len(_DEFERRED_TO_R12)] == _DEFERRED_TO_R12, (
        "deferred r04 names must head the rotated list so r12's rotation "
        "picks them up first"
    )
    # every deferred name's kernel family still grades this round
    siblings = {
        "multimodal_frame_sample": "multimodal_decode_meta",
        "text_fingerprint": "text_rolling_fingerprint",
        "minhash_cluster_dedup": "minhash_lsh_dedup",
        "embedding_cluster_dedup": "embedding_near_dup",
    }
    for deferred, sib in siblings.items():
        assert sib in window, f"deferred {deferred} has no in-window sibling"
