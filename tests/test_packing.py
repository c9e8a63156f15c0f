"""Unit tests for sequence packing, balanced mixture sampling, and the
shared prefix-boundary kernel (token-budget selection): each operator is
checked against a straightforward single-threaded Python reference on the
same rows, plus determinism and edge cases."""

import hashlib

import pytest
from pyspark.sql import functions as F

from spark_on_hbase_spark.operators import agg as A
from spark_on_hbase_spark.operators import packing as P
from spark_on_hbase_spark.operators import scan as S

BUDGET, SHARDS = 50, 4


def _md5(x) -> str:
    return hashlib.md5(str(x).encode()).hexdigest()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, 7 + (i * 13) % 23) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _shard(x) -> int:
    # md5 hex chars 9-16 as int, mod num_shards (hash-uniform under any id
    # pattern; independent of the chars-1-8-prefixed order key)
    return int(_md5(x)[8:16], 16) % SHARDS


def _reference_pack(rows):
    """Single-threaded reference: per shard, md5-order, exclusive cumsum."""
    placed = {}
    for shard in range(SHARDS):
        members = sorted(
            (r for r in rows if _shard(r[0]) == shard),
            key=lambda r: (_md5(r[0]), r[0]),
        )
        cum = 0
        for doc_id, toks in members:
            placed[doc_id] = (shard, cum // BUDGET, cum % BUDGET)
            cum += toks
    return placed


def test_pack_sequences_matches_reference(spark, docs):
    packed = P.pack_sequences(docs, "n_tokens", BUDGET, num_shards=SHARDS)
    got = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["seq_offset"])
        for r in packed.collect()
    }
    assert got == _reference_pack([(i, 7 + (i * 13) % 23) for i in range(200)])


def test_packing_census_accounts_for_every_doc(spark, docs):
    packed = P.pack_sequences(docs, "n_tokens", BUDGET, num_shards=SHARDS)
    census = P.packing_census(packed, "n_tokens").collect()
    assert sum(r["n_docs"] for r in census) == 200
    total = docs.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(r["seq_tokens"] for r in census) == total
    # per shard, seq ids are contiguous from 0 (concatenate-and-chunk never
    # skips a window: every window receives at least the straddling doc)
    by_shard = {}
    for r in census:
        by_shard.setdefault(r["shard"], []).append(r["seq_id"])
    for shard, seqs in by_shard.items():
        assert sorted(seqs) == list(range(len(seqs))), f"shard {shard} gapped"


def test_pack_sequences_shard_uniform_under_strided_ids(spark):
    """All-even ids (an upstream filter artifact) must still spread across
    shards — the md5-derived shard is id-pattern-free, where a plain
    id %% num_shards would land everything on the even shards."""
    rows = [(2 * i, 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = P.pack_sequences(df, "n_tokens", BUDGET, num_shards=SHARDS)
    counts = [r["n"] for r in packed.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == SHARDS                # every shard populated
    assert max(counts) < 2.0 * (400 / SHARDS)   # no gross skew


def test_pack_sequences_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError):
        P.pack_sequences(docs, "n_tokens", 0)


def test_pack_sequences_rejects_reserved_column_collision(spark, docs):
    """Input already carrying 'shard' (or an internal name) must fail fast,
    not silently shadow user data under the packing window."""
    with pytest.raises(ValueError, match="collide"):
        P.pack_sequences(docs.withColumn("shard", F.lit(0)), "n_tokens", BUDGET)
    with pytest.raises(ValueError, match="collide"):
        P.pack_sequences(docs.withColumn("__cum", F.lit(0)), "n_tokens", BUDGET)


def test_take_prefix_mass_matches_reference(spark, docs):
    order = [F.col("n_tokens").desc(), F.col("doc_id")]
    got = {
        r["doc_id"]
        for r in A.take_prefix_mass(docs, order, "n_tokens", 500).collect()
    }
    rows = sorted(
        [(i, 7 + (i * 13) % 23) for i in range(200)],
        key=lambda r: (-r[1], r[0]),
    )
    cum, want = 0, set()
    for doc_id, toks in rows:
        if cum < 500:
            want.add(doc_id)
        cum += toks
    assert got == want
    # a kept-set is a prefix: strictly better-ordered rows of any kept row
    # are kept too (catches partition-boundary off-by-ones)
    assert len(want) > 0 and len(want) < 200


def test_take_prefix_mass_budget_edges(spark, docs):
    order = [F.col("n_tokens").desc(), F.col("doc_id")]
    assert A.take_prefix_mass(docs, order, "n_tokens", 0).count() == 0
    assert A.take_prefix_mass(docs, order, "n_tokens", 10**9).count() == 200
    # budget smaller than the first row's mass still takes that row
    assert A.take_prefix_mass(docs, order, "n_tokens", 1).count() == 1


def test_cutoff_unchanged_by_kernel_refactor(spark):
    # 'a' carries 6/12 of mass; threshold .4 must drop exactly 'a'
    pairs = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 2 + [("d",)] * 1, "k string"
    )
    kept = {r["k"]: r["freq"] for r in A.cutoff(pairs, "k", 0.4).collect()}
    assert kept == {"b": 3, "c": 2, "d": 1}


def test_balanced_sample_keeps_smallest_domain_whole(spark):
    rows = [(i, "big") for i in range(300)] + [(1000 + i, "small") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = S.balanced_sample(df, "source", "doc_id")
    counts = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 20  # rate exactly 1.0 -> cutoff 2^32 keeps all
    # big downsampled toward 20; Bernoulli, so allow slack but require a cut
    assert 5 <= counts["big"] <= 60
    # deterministic: same rows on a second evaluation
    again = {r["doc_id"] for r in S.balanced_sample(df, "source", "doc_id").collect()}
    assert again == {r["doc_id"] for r in kept.collect()}


def test_temperature_mixture_sits_between_balanced_and_noop(spark):
    """alpha=0.5 keep-rate sqrt(n_min/n_d): the rarest domain keeps
    everything; the dominant one keeps MORE than equal-mixture would
    (sqrt(20/300) ~ 0.26 vs 20/300 ~ 0.067) but clearly fewer than all;
    and the kept set is a SUPERSET of balanced_sample's (same salt, a
    higher cutoff can only add rows)."""
    rows = [(i, "big") for i in range(300)] + [(1000 + i, "small") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    temp = S.temperature_mixture_sample(df, "source", "doc_id")
    counts = {r["source"]: r["n"] for r in temp.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 20  # sqrt(1.0) -> cutoff 2^32 keeps all
    # expectation 300*sqrt(20/300) ~ 77; wide Bernoulli slack
    assert 40 <= counts["big"] <= 120
    bal_ids = {r["doc_id"] for r in S.balanced_sample(df, "source", "doc_id").collect()}
    temp_ids = {r["doc_id"] for r in temp.collect()}
    assert bal_ids <= temp_ids


def test_pack_sequences_census_is_single_shuffle_no_global_window(spark, docs):
    """The 100 TB pin: packing + census plan exactly ONE exchange (the shard
    shuffle — the census agg reuses the window's partitioning) and every
    Window node is partitioned (a partition-less global window would drag
    the corpus to one task)."""
    from spark_on_hbase_spark import plans

    import re

    packed = P.pack_sequences(docs, "n_tokens", BUDGET, num_shards=SHARDS)
    census = P.packing_census(packed, "n_tokens")
    assert plans.count_shuffles(census) == 1
    plan = plans.formatted_plan(census)
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "expected the packing cumsum window in the plan"
    # a global window's spec starts with the ORDER expression; the sharded
    # one leads with the shard partition column
    for s in specs:
        assert "shard" in s.split(",")[0], f"unsharded window spec: {s}"


def test_take_prefix_mass_has_no_global_per_row_window(spark, docs):
    """Only the straddling partition's LOCAL window may appear: every Window
    node in the plan must be partitioned by __pid, never global."""
    from spark_on_hbase_spark import plans

    order = [F.col("n_tokens").desc(), F.col("doc_id")]
    sel = A.take_prefix_mass(docs, order, "n_tokens", 500)
    plan = plans.formatted_plan(sel)
    import re

    # per-row running-sum windows must carry a partition spec (__pid); the
    # offsets window is over the per-partition totals (tiny) and is the one
    # allowed global window — it ranges over n_partitions rows, not data
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    per_row = [s for s in specs if "__run_local" in s or "n_tokens" in s]
    for s in per_row:
        assert "__pid" in s, f"unpartitioned per-row window: {s}"


@pytest.mark.parametrize(
    "masses, budget",
    [
        ([5] * 64, 20),              # all-equal: boundary lands mid-run of ties
        ([1000] + [1] * 63, 3),      # one huge head row swallows the budget
        ([0, 0, 5, 0, 7] * 13, 9),   # zero-mass rows (empty intervals)
        ([1] * 64, 64),              # boundary exactly at total mass
        ([3] * 64, 1_000_000),       # budget beyond total: keep everything
    ],
)
def test_take_prefix_mass_adversarial_shapes(spark, masses, budget):
    """Kernel equivalence on shapes that stress partition-boundary
    arithmetic: ties across the cut, a single row over budget, zero-mass
    rows, exact-total budgets."""
    rows = [(i, m) for i, m in enumerate(masses)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(8)
    order = [F.col("n_tokens").desc(), F.col("doc_id")]
    got = {r["doc_id"] for r in A.take_prefix_mass(df, order, "n_tokens", budget).collect()}
    cum, want = 0, set()
    for doc_id, m in sorted(rows, key=lambda r: (-r[1], r[0])):
        if cum < budget:
            want.add(doc_id)
        cum += m
    assert got == want


def test_take_prefix_mass_zero_mass_row_at_exact_boundary(spark):
    """A zero-mass row whose interval starts exactly at the budget must be
    EXCLUDED regardless of where range-partition boundaries fall: with one
    partition the old wholesale rule (offset+total <= cut) classified the
    whole partition 'below' and smuggled the row in, diverging from the
    per-row rule and from any other partitioning of the same data."""
    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 0)], "doc_id long, n_tokens long"
    ).repartition(1)
    order = [F.col("n_tokens").desc(), F.col("doc_id")]
    got = {r["doc_id"] for r in A.take_prefix_mass(df, order, "n_tokens", 10).collect()}
    assert got == {1, 2}  # the trailing zero-mass row starts AT the cut
    # same data, many partitions: identical membership
    df8 = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 0)], "doc_id long, n_tokens long"
    ).repartition(8)
    got8 = {r["doc_id"] for r in A.take_prefix_mass(df8, order, "n_tokens", 10).collect()}
    assert got8 == got


def test_pack_sequences_rejects_bad_shards(spark, docs):
    with pytest.raises(ValueError):
        P.pack_sequences(docs, "n_tokens", 50, num_shards=0)
