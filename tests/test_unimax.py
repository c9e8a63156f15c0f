"""UniMax water-filling (agg.unimax_waterfill): closed-form allocation
pinned against a brute-force Python waterfill, plus the invariants
(budget never exceeded, caps never exceeded, uniform water level)."""

import pytest
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators.agg import unimax_waterfill

# (source, n_tokens, cap): caps chosen so some bind and some don't
ROWS = [
    ("a", 100, 120),   # small cap -> binds
    ("b", 100, 150),   # binds
    ("c", 100, 400),
    ("d", 100, 400),
    ("e", 100, 1000),
]
BUDGET = 800  # "8 epochs of one source" -> water level above a+b's caps


def _brute(rows, budget):
    """Independent waterfill definition: the maximum uniform integer
    water level T with sum(min(cap, T)) <= budget; alloc = min(cap, T).
    (Linear search over T — no shared arithmetic with the closed form.)"""
    caps = {s: c for s, _, c in rows}
    t_star = 0
    for t in range(budget + 1):
        if sum(min(c, t) for c in caps.values()) <= budget:
            t_star = t
    return {s: min(c, t_star) for s, c in caps.items()}


@pytest.fixture(scope="module")
def sizes(spark):
    return spark.createDataFrame(ROWS, ["source", "n_tokens", "cap"])


def test_matches_bruteforce_waterfill(sizes):
    got = {r.source: r.alloc
           for r in unimax_waterfill(sizes, str(BUDGET)).collect()}
    assert got == _brute(ROWS, BUDGET)


def test_invariants(sizes):
    rows = unimax_waterfill(sizes, str(BUDGET)).collect()
    caps = {s: c for s, _, c in ROWS}
    assert sum(r.alloc for r in rows) <= BUDGET
    for r in rows:
        assert r.alloc <= caps[r.source]
    # uncapped sources all sit at the same water level
    levels = {r.alloc for r in rows if r.alloc < caps[r.source]}
    assert len(levels) == 1


def test_budget_larger_than_all_caps_gives_caps(sizes):
    got = {r.source: r.alloc
           for r in unimax_waterfill(sizes, "1000000").collect()}
    assert got == {s: c for s, _, c in ROWS}


def test_budget_expr_sees_window_totals(sizes):
    # __tot = 500, so "__tot DIV 5" = 100 split across 5 sources = 20 each
    got = {r.source: r.alloc
           for r in unimax_waterfill(sizes, "__tot DIV 5").collect()}
    assert got == {s: 20 for s, _, _ in ROWS}


def test_epochs_pm(sizes):
    rows = unimax_waterfill(sizes, str(BUDGET)).collect()
    for r in rows:
        assert r.epochs_pm == (1000 * r.alloc) // r.n_tokens
