"""Grading-window invariants: the correctness driver grades only the FIRST
50 registry entries per round, so registration order is part of the
contract (see inventory._ROTATED_OUT_R05)."""

from spark_on_hbase_spark.inventory import _ROTATED_OUT_R05, QUERIES

# Round-5 must-grade set: the 3 NEW perceptual-hash queries (no green row
# yet) plus every query whose last green oracle row is CORRECTNESS_r02 —
# the stale tail VERDICT r4 item 1 requires back inside the window. After
# this round every registry query's most recent green row is r03 or newer.
_MUST_GRADE_R05 = {
    # new in round 5 — the perceptual near-dup family under the hard signal
    "image_near_dup_census", "video_frame_phash", "audio_energy_hash_census",
    # retuned in round 5 (B=10/L=4/2-bit multi-probe): results changed, so
    # the fresh r04 row no longer covers it — must re-grade
    "ann_lsh_topk",
    # upgraded in round 5 (64-bit signatures + Manku block pairing):
    # results changed — must re-grade
    "simhash_dedup",
    # last graded in CORRECTNESS_r02 (44 names)
    "right_outer_lookup_join", "mutation_upsert_merge", "salted_join_revenue",
    "pool_count", "edge_dedup", "network_counts", "degree_histogram",
    "connected_components", "bsp_3step", "graph_inner_expand",
    "cutoff_super_connected", "two_level_aggregate", "text_lang_id",
    "merge_join_big_big", "filter_comparison", "map_contains", "lookup_join",
    "latest_version_scan", "semi_join", "anti_join_spellcheck",
    "pair_frequency", "scan_required_columns", "graph_expand", "as_of_join",
    "range_join_incidents", "time_range_scan", "fill_join", "value_histogram",
    "sample_scan", "keyspace_scan", "sql_api_revenue_by_nation",
    "tumbling_window_agg", "sliding_window_agg", "session_window_agg",
    "rollup_revenue", "distinct_counts", "window_running_totals",
    "quantile_summary", "top_k_customers", "set_ops_part_flags",
    "cross_join_grid", "approx_distinct_gate", "approx_quantile_gate",
    "partition_distribution",
}


def test_rotation_list_sizes_the_window_exactly():
    assert len(_ROTATED_OUT_R05) == len(QUERIES) - 50, (
        "rotated-out list must equal total-50: when adding a graded query, "
        "rotate one more freshly-green name out (inventory.py invariant note)"
    )
    assert len(set(_ROTATED_OUT_R05)) == len(_ROTATED_OUT_R05), (
        "duplicate name in the rotated-out list: a dup inflates the length "
        "check while silently shrinking the tail by one"
    )


def test_rotated_names_exist_and_sit_in_the_tail():
    names = list(QUERIES)
    tail = set(names[50:])
    for n in _ROTATED_OUT_R05:
        assert n in QUERIES, f"rotated name {n} not registered"
        assert n in tail, f"{n} listed as rotated out but inside the window"


def test_round5_must_grade_queries_are_inside_the_window():
    window = set(list(QUERIES)[:50])
    missing = _MUST_GRADE_R05 - window
    assert not missing, f"stale/new queries outside the graded window: {missing}"


def test_every_query_has_an_oracle():
    no_oracle = [n for n, s in QUERIES.items() if s.sql is None]
    assert no_oracle == [], f"rows-only checks remaining: {no_oracle}"
