"""Aggregations (SURVEY.md §2.4, A1-A16).

All are single hash-aggregations with map-side partial aggregation (Catalyst
plans partial+final automatically), replacing the reference's
aggregateByKey/reduceByKey chains. The one driver-side pattern in the
reference — cutoff's collected cumulative histogram (AGraph.scala:103-107) —
is re-expressed as a distributed window cumulative sum, which survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram(df: DataFrame, value_col: str | Column) -> DataFrame:
    """A1 — value-frequency histogram (AGraph.hist, AGraph.scala:61):
    ``map(v->(v,1)).aggregateByKey.sortByKey`` becomes groupBy().count().
    Returns (value, freq) sorted by value."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return df.groupBy(c.alias("value")).agg(F.count("*").alias("freq")).orderBy("value")


def frequency(df: DataFrame, key_col: str) -> DataFrame:
    """A3 — occurrences per key (AGraph.frequency, AGraph.scala:68-70)."""
    return df.groupBy(key_col).agg(F.count("*").alias("freq"))


def prefix_boundary_split(
    df: DataFrame, order: list[Column], mass_col: str, boundary
) -> tuple[DataFrame, DataFrame]:
    """Split a relation at a cumulative-mass boundary — the distributed
    kernel shared by ``cutoff`` (A11) and ``take_prefix_mass``.

    Rows are ordered by ``order``; each row occupies the half-open
    cumulative-mass interval ``[start, start + mass)``. ``boundary`` is a
    callable ``total_mass_column -> Column`` giving the cut point; the
    return value is ``(below, at_or_above)``: rows whose interval STARTS
    before the cut, and the rest. Both sides are lazy — a caller consuming
    only one pays nothing for the other.

    A driver-collected cumulative histogram (the reference's approach,
    AGraph.scala:103-107) dies at scale, and so would a single
    ``Window.orderBy`` (no partition): Spark moves the ENTIRE relation to
    one partition for a global ordered window, and at 100 TB "one row per
    distinct key" can still be billions of rows. This is the classic
    two-phase distributed prefix sum, with per-row running sums needed ONLY
    where the boundary actually falls:

    1. range-partition by the cumulative order — partition i's rows all
       precede partition i+1's;
    2. per-partition mass totals (partial-agg to one row per partition, a
       micro-exchange) prefix-summed with a tiny single-partition window and
       broadcast back as offsets;
    3. every partition whose mass interval lies entirely on one side of the
       boundary resolves wholesale — decided by the broadcast offsets, NO
       per-row ordering work; exactly ONE partition can straddle the
       boundary, and only ITS rows pay a local running-sum window (an
       exchange of 1/Nth of the relation)."""
    out_cols = list(df.columns)
    # pid is assigned right after the range exchange; AQE may coalesce range
    # partitions but only ADJACENT ones, so pid stays monotone in sort order.
    # The relation is consumed three times (totals, wholesale decisions, the
    # boundary window) — a lazy localCheckpoint materializes the range
    # exchange ONCE and pins a single consistent pid assignment
    # (spark_partition_id is nondeterministic, so without the barrier each
    # consumer would re-shuffle and could disagree on pids).
    part = (
        df.repartitionByRange(*order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # one row per partition after map-side partial aggregation, so this
    # exchange moves n_partitions rows, not the relation
    totals = part.groupBy("__pid").agg(F.sum(mass_col).alias("__part_total"))
    # prefix-sum the per-partition totals with a window that is global but
    # TINY (n_partitions rows), then broadcast the offsets back
    prefix_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        "__part_total",
        F.coalesce(F.sum("__part_total").over(prefix_w), F.lit(0)).alias("__offset"),
        F.sum("__part_total").over(Window.partitionBy()).alias("__total"),
    )
    cut = boundary(F.col("__total"))
    placed = part.join(F.broadcast(offsets), "__pid")
    # interval arithmetic per partition: [offset, offset + part_total) vs cut
    above_whole = F.col("__offset") >= cut       # every row starts at/after cut
    # STRICT <: a partition ending exactly at the cut may hold a trailing
    # ZERO-mass row whose interval starts at the cut — the per-row rule
    # (start < cut) puts it above, so classifying such a partition wholesale
    # as below would make membership depend on where range-partition
    # boundaries fell; sending it down the straddle path keeps the result
    # partitioning-independent (cost: one extra partition pays the local
    # window only when the boundary lands exactly on a partition edge)
    below_whole = (F.col("__offset") + F.col("__part_total")) < cut
    # the (at most one) straddling partition: per-row running sum, local sort
    straddle = placed.where(~above_whole & ~below_whole)
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = straddle.withColumn("__run_local", F.sum(mass_col).over(local_w))
    start = F.col("__offset") + F.col("__run_local") - F.col(mass_col)
    below = placed.where(below_whole).select(*out_cols).unionByName(
        run.where(start < cut).select(*out_cols)
    )
    above = placed.where(above_whole).select(*out_cols).unionByName(
        run.where(start >= cut).select(*out_cols)
    )
    return below, above


def cutoff(
    pairs: DataFrame, key_col: str, threshold: float = 0.05
) -> DataFrame:
    """A11 — drop super-connected keys carrying the top ``threshold`` of
    total mass (AGraph.cutoff, AGraph.scala:98-113).

    A key is dropped iff its cumulative-mass interval *starts* before the
    threshold boundary (``running - freq < total * threshold``), ordered by
    descending frequency (ties broken by key for determinism) — so a single
    key carrying more than the whole threshold is still dropped. Returns the
    surviving keys with their frequencies. Distributed shape: see
    ``prefix_boundary_split`` (the reference collects the histogram to the
    driver and broadcasts a Set, which dies at scale)."""
    freq = pairs.groupBy(key_col).agg(F.count("*").alias("freq"))
    order = [F.col("freq").desc(), F.col(key_col)]
    _, kept = prefix_boundary_split(
        freq, order, "freq", lambda total: total * F.lit(threshold)
    )
    return kept


def take_prefix_mass(
    df: DataFrame, order: list[Column], mass_col: str, budget
) -> DataFrame:
    """Global budgeted selection: walk the relation in ``order`` and keep
    rows until their cumulative ``mass_col`` reaches ``budget`` — the
    corpus-selection primitive of a training pipeline ("take the
    highest-quality documents up to N tokens"). A row is kept iff its
    cumulative-mass interval STARTS before the budget, so the selection is
    never empty while mass remains and a single over-budget row at the front
    is still taken (matching ``cutoff``'s boundary convention). Fully
    distributed via the shared two-phase prefix sum — no global window, no
    driver-side cumsum (see ``prefix_boundary_split``)."""
    kept, _ = prefix_boundary_split(df, order, mass_col, lambda _t: F.lit(budget))
    return kept


def two_level_aggregate(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """A10 — reduce per group key, then global reduce ->
    (#groups, #members, sum) (AGraph.aggregate, AGraph.scala:286-301).
    Catalyst plans this as partial + final aggregation — the distributed shape
    the reference hand-built with reduceByKey + aggregate."""
    per_group = df.groupBy(group_col).agg(
        F.count("*").alias("members"), F.sum(value_col).alias("group_sum")
    )
    return per_group.agg(
        F.count("*").alias("n_groups"),
        F.sum("members").alias("n_members"),
        F.sum("group_sum").alias("total"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered multi-step funnel over an event stream: per user, stage k is
    reached at the FIRST occurrence of ``steps[k]`` strictly after the time
    stage k-1 was reached. Returns one row per stage:
    (stage, step, n_users, conversion) with conversion = n / previous
    stage's n (1.0 for the first stage).

    Shape at 100 TB: per stage one predicate-pushed scan of the event
    relation (only that step's type), one join + MIN aggregation — every
    shuffle keys on the user, so consecutive stages reuse the same
    hash partitioning (AQE/ENSURE_REQUIREMENTS elide repeats), and no
    per-user event array is ever collected (the sessionize-then-sort
    approach dies on celebrity users). The final conversion window runs
    over len(steps) rows — bounded, not the global-window trap."""
    summaries = []
    cur: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = events.where(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        if cur is None:
            cur = ev.groupBy(user_col).agg(F.min("__ts").alias("__t"))
        else:
            cur = (
                ev.join(cur, user_col)
                .where(F.col("__ts") > F.col("__t"))
                .groupBy(user_col)
                .agg(F.min("__ts").alias("__t"))
            )
        # each stage relation (<= one row per user) is read by the next
        # stage AND its own summary: without materialization, stage k's
        # plan re-derives stages 1..k-1, re-scanning the event relation
        # O(len(steps)^2) times — measured 10 scans for a 4-step funnel.
        # localCheckpoint, not persist: a persist entry would outlive the
        # call (nothing can release it), while checkpoint blocks are
        # GC-reclaimed once the returned DataFrame is dropped.
        cur = cur.localCheckpoint(eager=False)
        summaries.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(i + 1).alias("stage"), F.lit(step).alias("step"), "n_users"
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    w = Window.orderBy("stage")
    return out.select(
        "stage",
        "step",
        "n_users",
        (
            F.col("n_users").cast("double")
            / F.coalesce(F.lag("n_users").over(w), F.col("n_users")).cast("double")
        ).alias("conversion"),
    ).orderBy("stage")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention over an event stream: users cohort by the DAY of
    their first event; a cohort's period-k retention is the fraction of its
    users active in [k*period_days, (k+1)*period_days) days after the
    cohort day. Returns (cohort_day, period, n_active, retention) ordered.

    Period indices are integer day arithmetic (floor(datediff/period)) on
    day-truncated timestamps, NOT engine week buckets — Spark's ``window``
    aligns weeks to the 1970-01-01 epoch while DuckDB's ``time_bucket``
    aligns them to 2000-01-03, so week buckets silently disagree across
    engines; day truncation + integer division is bucket-origin-free and
    exact everywhere. Shape: two user-keyed aggregations and one distinct,
    all sharing the user partitioning; the cohort-size join broadcasts
    (one row per cohort day)."""
    ev = events.select(
        F.col(user_col).alias("__u"), F.to_date(F.col(ts_col)).alias("__day")
    )
    # first is read twice (cohort sizes + the activity join): materialize
    # the one-row-per-user relation instead of re-scanning events per
    # reference; localCheckpoint so the blocks are GC-reclaimed once the
    # returned DataFrame is dropped (a persist entry would leak per call)
    first = (
        ev.groupBy("__u")
        .agg(F.min("__day").alias("cohort_day"))
        .localCheckpoint(eager=False)
    )
    sizes = first.groupBy("cohort_day").agg(F.count("*").alias("__cohort_size"))
    active = (
        ev.join(first, "__u")
        .select(
            "__u",
            "cohort_day",
            F.floor(F.datediff("__day", "cohort_day") / period_days)
            .cast("int")
            .alias("period"),
        )
        .distinct()
    )
    return (
        active.groupBy("cohort_day", "period")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "period",
            "n_active",
            (F.col("n_active").cast("double") / F.col("__cohort_size")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_day", "period")
    )


def daily_volume_anomaly(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Volume anomaly detection: z-score of each (type, day) event count
    against that type's daily distribution. Returns
    (event_type, day, n_events, z) for every day, ordered — gate with
    ``abs(z) >= t`` downstream.

    Cross-engine exactness: never uses the engines' stddev (their
    sum-of-squares accumulate in partition order, which differs between
    engines and runs). Instead the per-type moments are EXACT integers —
    count of days, sum of counts, sum of squared counts in DECIMAL(38,0)
    (a day count squared overflows BIGINT at 100 TB volumes) — and
    mean/variance/z are derived by a fixed expression tree of IEEE ops;
    sqrt is correctly-rounded per IEEE-754 (unlike ln), so both engines
    produce bit-identical z. Two hash aggregations; the per-type moment
    relation (one row per type) broadcasts back."""
    daily = events.groupBy(
        type_col, F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("n_events"))
    moments = daily.groupBy(type_col).agg(
        F.count("*").alias("__m"),
        F.sum("n_events").alias("__s"),
        F.sum(F.col("n_events").cast("decimal(19,0)") * F.col("n_events")).alias(
            "__ss"
        ),
    )
    mean = F.col("__s").cast("double") / F.col("__m").cast("double")
    var = (
        F.col("__ss").cast("double")
        - F.col("__s").cast("double") * F.col("__s").cast("double")
        / F.col("__m").cast("double")
    ) / (F.col("__m") - F.lit(1)).cast("double")
    z = F.when(
        (F.col("__m") > 1) & (var > 0),
        (F.col("n_events").cast("double") - mean) / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    return (
        daily.join(F.broadcast(moments), type_col)
        .select(type_col, "day", "n_events", z.alias("z"))
        .orderBy(type_col, "day")
    )


def partition_distribution(df: DataFrame, partition_col: Column) -> DataFrame:
    """A15 — per-partition row counts + spread stats
    (RDDUtils.distribution/printDistribution, misc/RDDUtils.scala:27-45).
    ``partition_col`` is any expression assigning a partition id (e.g.
    keys.key_partition_expr); returns one row of distribution stats."""
    counts = df.groupBy(partition_col.alias("pid")).agg(F.count("*").alias("cnt"))
    return counts.agg(
        F.count("*").alias("n_partitions"),
        F.min("cnt").alias("min_cnt"),
        F.max("cnt").alias("max_cnt"),
        F.avg("cnt").alias("mean_cnt"),
        F.stddev_pop("cnt").alias("stdev_cnt"),
    )


def approx_distinct(
    df: DataFrame, group_cols: list[str], value_cols: list[str], rsd: float = 0.05
) -> DataFrame:
    """Approximate distinct counts per group via HyperLogLog++ — the 100 TB
    form of exact multi-distinct (SURVEY.md §2.4 notes the reference has no
    distinct-count at all). Exact COUNT(DISTINCT x) plans an Expand +
    distinct shuffle whose state is O(#distinct values); the HLL sketch is a
    fixed few-KB register array per (group, column) with map-side partial
    merge, so the aggregation stays one partial+final pipeline at any scale.
    Register merge is element-wise max — commutative and associative — and
    the value hashing is deterministic, so results are run-stable for fixed
    data regardless of partitioning or task order (what lets the graded
    query gate it against the exact oracle)."""
    return df.groupBy(*group_cols).agg(
        *[
            F.approx_count_distinct(c, rsd=rsd).alias(f"approx_{c}")
            for c in value_cols
        ]
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probabilities: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate per-group quantiles (Greenwald-Khanna summaries) — the
    100 TB form of exact percentiles, which buffer every group value. The
    summary retains O(accuracy) samples per group with a guaranteed rank
    error <= 1/accuracy that holds under any partial-merge order, so a
    tolerance derived from that bound is stable run to run. Returns one
    ``approx_q{i}`` column per requested probability."""
    qs = F.percentile_approx(
        value_col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )
    return df.groupBy(*group_cols).agg(
        *[
            F.element_at(qs, i + 1).alias(f"approx_q{i}")
            for i in range(len(probabilities))
        ]
    )


def hll_rollup(
    df: DataFrame,
    group_cols: list[str],
    slice_col,
    value_col: str,
    lg_k: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """Re-aggregable distinct-count rollup — the hypertable/cube pattern:
    materialize one HLL SKETCH per (group, slice) (slice = day, hour,
    partition...), then answer ANY coarser rollup by unioning sketches
    instead of rescanning events. Exact distinct counts cannot do this
    (distinct is not re-aggregable: yesterday's count + today's count
    double-counts returning users); sketch union is the scale answer, and
    HLL register-wise max union is lossless — the union of daily sketches
    IS the sketch of the union (identical registers, identical estimate).

    Returns ``(slices, rolled)``: the per-slice sketch relation (store
    this — kilobytes per slice at any event volume) and the per-group
    union estimate with its slice count. Both are single partial+final
    hash aggregations."""
    s = slice_col if not isinstance(slice_col, str) else F.col(slice_col)
    slices = df.groupBy(*group_cols, s.alias("slice")).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )
    rolled = slices.groupBy(*group_cols).agg(
        F.count("*").alias("n_slices"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
    )
    return slices, rolled


def group_percentiles(
    df: DataFrame,
    group_col: str,
    score_col: str,
    quant: int = 1000,
) -> DataFrame:
    """Within-group rank normalization: every row gains ``pct_pm`` — the
    per-mille fraction of its group's rows whose score is <= its own
    (``(1000 * cum) div total``, exact integers). The calibration primitive
    behind per-domain corpus filtering: raw quality scores are not
    comparable across sources (a news domain's median beats a forum's
    p90), but a SINGLE keep-rate applied to within-source percentiles is —
    quantile normalization at corpus scale.

    Shape: per-(group, score) histogram (one hash aggregation — the score
    must already be an integer quantization, callers' job), ascending
    cumulative counts via a window over the groups x distinct-scores
    relation (tiny by construction: <= groups * quant rows when scores are
    per-mille), broadcast join back onto the rows. The corpus is never
    sorted; ties share a percentile (they land on the same side of any
    cut, retry-stable)."""
    from pyspark.sql import Window

    hist = df.groupBy(group_col, score_col).agg(F.count("*").alias("__n"))
    w = Window.partitionBy(group_col).orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("__cum", F.sum("__n").over(w)).withColumn(
        "__total", F.sum("__n").over(Window.partitionBy(group_col))
    )
    pct = cum.select(
        group_col,
        score_col,
        F.expr(f"({quant} * __cum) div __total").alias("pct_pm"),
    )
    return df.join(F.broadcast(pct), [group_col, score_col])


def unimax_waterfill(
    sizes: DataFrame,
    budget_expr: str,
    group_col: str = "source",
    size_col: str = "n_tokens",
    cap_col: str = "cap",
) -> DataFrame:
    """UniMax-style training-budget allocation (Chung et al. 2023,
    arXiv:2304.09151): split a token budget across sources as UNIFORMLY as
    possible subject to a per-source repetition cap — the water-filling
    problem, solved in closed form over the aggregated per-source relation
    with exact integer arithmetic.

    ``sizes`` is one row per source carrying ``size_col`` (its corpus
    tokens) and ``cap_col`` (its max allocation, e.g. C epochs * tokens).
    Sort sources by cap ascending; source i is capped iff giving every
    smaller source its cap and splitting the remainder equally still
    clears cap_i: cap_i * (n - i) + cumcap_i <= B. With k capped sources
    the water level is T = (B - cumcap_k) DIV (n - k); alloc = min(cap, T)
    (floored, so SUM(alloc) <= B always).

    Scale shape: the corpus-sized work is whatever built ``sizes`` (one
    aggregation) — it is planned ONCE, because every global constant (n,
    budget, k, water level) is a window aggregate over the same tiny
    relation rather than a crossJoin of re-planned agg branches (the
    crossJoin form re-scanned the corpus 4x). The windows ARE global —
    bounded by construction (domain cardinality, thousands at most,
    post-aggregation), the documented tiny-relation exception the plan
    gate's 4th count records. ``budget_expr`` is a SQL expression over
    ``__n`` (source count) and ``__tot`` (SUM of size_col), e.g.
    "(3 * __tot) DIV 2". Returns (group, size, cap, alloc, epochs_pm =
    1000*alloc div size), deterministic under cap ties (group tiebreak)."""
    single = Window.partitionBy()
    w = Window.orderBy(cap_col, group_col)
    out = (
        sizes.withColumn("__n", F.count("*").over(single).cast("bigint"))
        .withColumn("__tot", F.sum(size_col).over(single).cast("bigint"))
        .withColumn("__b", F.expr(budget_expr).cast("bigint"))
        .withColumn("__i", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "__cum",
            F.sum(cap_col).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("bigint"),
        )
        .withColumn(
            "__capped",
            F.expr(f"{cap_col} * (__n - __i) + __cum <= __b"),
        )
        .withColumn(
            "__k",
            F.sum(F.col("__capped").cast("bigint")).over(single).cast("bigint"),
        )
        .withColumn(
            "__cumk",
            F.max(F.when(F.col("__capped"), F.col("__cum"))).over(single).cast("bigint"),
        )
        .withColumn(
            "alloc",
            F.expr(
                f"CAST(CASE WHEN __capped THEN {cap_col}"
                f" ELSE (__b - COALESCE(__cumk, 0)) DIV (__n - __k) END"
                f" AS BIGINT)"
            ),
        )
    )
    return out.select(
        group_col,
        F.col(size_col).cast("bigint").alias(size_col),
        F.col(cap_col).cast("bigint").alias(cap_col),
        "alloc",
        F.expr(f"CAST((1000 * alloc) DIV {size_col} AS BIGINT)").alias(
            "epochs_pm"
        ),
    )


def doremi_reweight(
    losses: DataFrame,
    group_col: str = "source",
    loss_col: str = "loss_pm",
    eta_pm: int = 10000,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429),
    one exponentiated-gradient step in exact integer arithmetic: domains
    whose proxy loss exceeds the reference get their mixture weight
    multiplied by exp2(eta * excess), then weights renormalize to
    per-mille. The reference loss here is the cross-domain mean (the
    uniform-prior single-step form); ``eta_pm`` is the learning rate in
    per-mille (10000 = doubling weight per 100 per-mille of excess loss).

        ref       = sum(loss) // n                   (truncating div)
        excess    = max(loss - ref, 0)
        exponent  = eta_pm * excess * QUANT // 1e6   (fixed-point bits)
        wexp      = iexp2fp(exponent)                (no-libm exp2)
        weight_pm = 1000 * wexp // sum(wexp)

    ``losses`` is the per-domain relation (one row per source); every
    global constant is a window aggregate over it — the same documented
    bounded tiny-relation global-window family as unimax_waterfill, so
    the corpus-sized work is whatever built the losses. Returns (group,
    loss, excess_pm, weight_pm)."""
    from spark_on_hbase_spark.operators.text import DSIR_QUANT, iexp2fp_sql

    single = Window.partitionBy()
    out = (
        losses.withColumn("__n", F.count("*").over(single).cast("bigint"))
        .withColumn("__tot", F.sum(loss_col).over(single).cast("bigint"))
        .withColumn("__ref", F.expr("__tot DIV __n"))
        .withColumn(
            "excess_pm",
            F.greatest(F.col(loss_col) - F.col("__ref"), F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "__x",
            F.expr(f"(CAST({eta_pm} AS BIGINT) * excess_pm * {DSIR_QUANT}) DIV 1000000"),
        )
        .withColumn("__w", F.expr(iexp2fp_sql("__x", "spark")))
        .withColumn("__wsum", F.sum("__w").over(single).cast("bigint"))
        .withColumn("weight_pm", F.expr("CAST((1000 * __w) DIV __wsum AS BIGINT)"))
    )
    return out.select(
        group_col,
        F.col(loss_col).cast("bigint").alias(loss_col),
        "excess_pm",
        "weight_pm",
    )
