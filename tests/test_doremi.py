"""DoReMi exponentiated-gradient reweighting (agg.doremi_reweight) and the
fixed-point exp2 primitive (text.iexp2fp_sql)."""

import math

import pytest
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators.agg import doremi_reweight
from spark_on_hbase_spark.operators.text import DSIR_QUANT as Q, iexp2fp_sql


def _iexp2(x):
    return (Q + (x % Q)) << (x // Q)


def test_iexp2fp_spark_matches_python_and_error_envelope(spark):
    xs = [0, 1, Q // 4, Q // 2, Q - 1, Q, 3 * Q + 12345, 10 * Q]
    rows = spark.createDataFrame([(x,) for x in xs], ["x"]).select(
        "x", F.expr(iexp2fp_sql("x", "spark")).alias("e")
    ).collect()
    for r in rows:
        assert r.e == _iexp2(r.x)
        true = 2 ** (r.x / Q)
        assert abs(r.e / Q / true - 1) < 0.062  # mantissa-trick envelope


LOSSES = [("a", 1000), ("b", 1100), ("c", 1200), ("d", 900)]


def _expected(eta_pm=10000):
    n = len(LOSSES)
    tot = sum(l for _, l in LOSSES)
    ref = tot // n  # 1050
    out = {}
    ws = {}
    for s, l in LOSSES:
        ex = max(l - ref, 0)
        ws[s] = _iexp2((eta_pm * ex * Q) // 1_000_000)
        out[s] = (l, ex)
    wsum = sum(ws.values())
    return {s: (l, ex, (1000 * ws[s]) // wsum) for s, (l, ex) in out.items()}


def test_matches_python_replay_and_eg_properties(spark):
    df = spark.createDataFrame(LOSSES, ["source", "loss_pm"])
    got = {r.source: (r.loss_pm, r.excess_pm, r.weight_pm)
           for r in doremi_reweight(df).collect()}
    assert got == _expected()
    # EG properties: higher loss -> weight monotone nondecreasing;
    # at-or-below-reference domains share the floor weight
    w = {s: got[s][2] for s in got}
    assert w["c"] > w["b"] > w["a"] == w["d"]
    assert sum(w.values()) <= 1000


def test_uniform_losses_give_uniform_weights(spark):
    df = spark.createDataFrame(
        [("a", 500), ("b", 500), ("c", 500), ("d", 500)],
        ["source", "loss_pm"],
    )
    got = {r.source: r.weight_pm for r in doremi_reweight(df).collect()}
    assert set(got.values()) == {250}
