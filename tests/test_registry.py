"""Grading-window invariants: the correctness driver grades only the FIRST
50 registry entries per round, so registration order is part of the
contract (see inventory._GRADED_R02_ROTATED_OUT)."""

from spark_on_hbase_spark.inventory import _GRADED_R02_ROTATED_OUT, QUERIES

# Round-4 must-grade set: queries with NO green CORRECTNESS row yet (new
# this round), plus rows whose engine or oracle changed since their last
# green grading (the two round-3 oracle CAST fixes and the retuned ANN
# config) — all MUST sit inside the first-50 window this round. The round-3
# must-grade tail is all green in CORRECTNESS_r03.json and may rotate out.
_MUST_GRADE_R03 = {
    # changed since their last grading
    "sequence_packing", "token_budget_selection",  # oracle CAST fixes
    "ann_lsh_topk",  # retuned to multi-probe B=8 L=4
    # new in round 4
    "incremental_bsp_resume", "csv_export_roundtrip", "ddl_evolution_fold",
    "span_dedup_census", "temperature_mixture_census", "ann_ivf_kmeans_topk",
    "grouped_topk_customers", "label_propagation_2step",
}


def test_rotation_list_sizes_the_window_exactly():
    assert len(_GRADED_R02_ROTATED_OUT) == len(QUERIES) - 50, (
        "rotated-out list must equal total-50: when adding a graded query, "
        "rotate one more r02-green name out (inventory.py invariant note)"
    )
    assert len(set(_GRADED_R02_ROTATED_OUT)) == len(_GRADED_R02_ROTATED_OUT), (
        "duplicate name in the rotated-out list: a dup inflates the length "
        "check while silently shrinking the tail by one"
    )


def test_rotated_names_exist_and_sit_in_the_tail():
    names = list(QUERIES)
    tail = set(names[50:])
    for n in _GRADED_R02_ROTATED_OUT:
        assert n in QUERIES, f"rotated name {n} not registered"
        assert n in tail, f"{n} listed as rotated out but inside the window"


def test_never_graded_queries_are_inside_the_window():
    window = set(list(QUERIES)[:50])
    missing = _MUST_GRADE_R03 - window
    assert not missing, f"queries without any green round outside window: {missing}"


def test_every_query_has_an_oracle():
    no_oracle = [n for n, s in QUERIES.items() if s.sql is None]
    assert no_oracle == [], f"rows-only checks remaining: {no_oracle}"
