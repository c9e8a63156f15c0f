"""Scan-side projections and filters (SURVEY.md §2.2, F1-F10).

In the reference each of these compiles into a server-side HBase Filter
mutated onto the per-region Scan (HBaseFilter.scala:6-10, HBaseQuery.scala:9-49).
Here they are plain Column predicates: Catalyst pushes them into the Parquet
scan (PushedFilters) and prunes columns — the same work, done by the optimizer
instead of by hand. Check with ``plans.assert_pushed_filters``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_required(df: DataFrame, *columns: str) -> DataFrame:
    """F1 — projection with the reference's mandatory-column semantics.

    ``rdd.select("CF:qual")`` adds a SingleColumnValueFilter(NOT_EQUAL, null,
    filterIfMissing=true): **rows missing any selected qualified column are
    dropped**, silently unlike SQL projection
    (HBaseRDDFunctions.scala:54-70, esp. :62-64). Column specs:

    - ``"col"``         — plain column, no drop (a family selection).
    - ``"col!"``        — qualified column: select and drop rows where null.
    - ``"map:key"``     — map-typed family qualifier: selects
                          ``element_at(map, key)`` AND drops rows missing it.
    """
    out_cols: list[Column] = []
    conditions: list[Column] = []
    for spec in columns:
        if ":" in spec:
            fam, qual = spec.split(":", 1)
            c = F.element_at(F.col(fam), qual).alias(f"{fam}_{qual}")
            out_cols.append(c)
            conditions.append(F.element_at(F.col(fam), qual).isNotNull())
        elif spec.endswith("!"):
            name = spec[:-1]
            out_cols.append(F.col(name))
            conditions.append(F.col(name).isNotNull())
        else:
            out_cols.append(F.col(spec))
    for cond in conditions:
        df = df.where(cond)
    return df.select(*out_cols)


def map_contains(df: DataFrame, map_col: str, key: str, value=None) -> DataFrame:
    """F4 — row has qualifier ``key`` in a map family, optionally with value
    == v (FamilyTransformation.contains, helpers/FamilyTransformation.scala:48-66)."""
    if value is None:
        return df.where(F.map_contains_key(F.col(map_col), F.lit(key)))
    return df.where(F.element_at(F.col(map_col), key) == F.lit(value))


def time_range(df: DataFrame, ts_col: str, min_ts, max_ts) -> DataFrame:
    """F5 — restrict to ``[min_ts, max_ts)``
    (rdd.filter(minStamp, maxStamp), HBaseRDDFunctions.scala:39-46)."""
    return df.where((F.col(ts_col) >= F.lit(min_ts)) & (F.col(ts_col) < F.lit(max_ts)))


def ttl_filter(df: DataFrame, ts_col: str, as_of, ttl_seconds: int) -> DataFrame:
    """TTL expiry as a read-side filter: keep rows whose cell timestamp is
    within ``ttl_seconds`` of ``as_of``. The reference's column families
    carry TTLs enforced by HBase at read/compaction time
    (HBaseAdminUtils.column ttl attr, misc/HBaseAdminUtils.scala:86-103;
    demo families use 30-360 days, HGraphTable.scala:23-25). On immutable
    storage the same semantics are a predicate (pushed to the scan) at read
    time, and physical removal happens at compaction — exactly HBase's
    model. ``as_of`` is explicit, never wall-clock: deterministic reads."""
    return df.where(
        F.col(ts_col) >= F.lit(as_of).cast("timestamp") - F.expr(f"INTERVAL {ttl_seconds} SECONDS")
    )


def consistency(df: DataFrame, level: str = "STRONG") -> DataFrame:
    """F6 — read-consistency selector (rdd.filter(consistency: Consistency),
    HBaseRDDFunctions.scala:33-37). A storage-replication concern with no
    analog on immutable columnar snapshots — every read here is strongly
    consistent by construction — so this is an explicit, documented no-op
    kept for API parity."""
    if level not in ("STRONG", "TIMELINE"):
        raise ValueError(f"unknown consistency level {level!r}")
    return df


def md5_salt(id_col: str) -> Column:
    """The engine's ONE deterministic sampling salt: the first 4 bytes of
    md5(id) as an unsigned 32-bit integer. Every sampler below (and the SQL
    twins via ``sample_sql``) derives from this exact expression — widening
    the hex window or changing the hash in one copy but not the others
    would silently desynchronize the samplers from each other and from
    their DuckDB oracles."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def sample_deterministic(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """F7 — row sampling (rdd.sample / server-side RandomRowFilter,
    HBaseRDDFunctions.scala:48-52), made *deterministic and cross-engine
    reproducible* by hashing the row id with md5 instead of a per-task RNG:
    a row is kept iff the first 4 salt bytes of md5(id), as an integer, fall
    under fraction * 2^32. Scan-local, no shuffle, stable under retries —
    which a 1000-executor job needs (RNG sampling resamples on task retry)."""
    return df.where(md5_salt(id_col) < F.lit(int(fraction * 4294967296)))


def sample_sql(id_sql: str, fraction: float) -> str:
    """DuckDB twin of sample_deterministic's predicate for SQL oracles."""
    return (
        f"CAST(('0x' || substring(md5(CAST({id_sql} AS VARCHAR)), 1, 8)) AS UBIGINT) "
        f"< {int(fraction * 4294967296)}"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling — the corpus-rebalancing
    primitive of a training-data pipeline (downsample the dominant language /
    source, keep the rare ones): each row keeps iff its md5(id) salt falls
    under its OWN stratum's rate. Same salt discipline as
    ``sample_deterministic`` (F7): scan-local, zero shuffle, stable under
    task retries and engine versions — resampling quota drift on retry is
    exactly what a 1000-executor ingest can't afford. Strata absent from
    ``rates`` fall back to ``default_rate``."""
    salt_int = md5_salt(id_col)
    cut = F.lit(int(default_rate * 4294967296))
    for stratum, rate in rates.items():
        cut = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * 4294967296))
        ).otherwise(cut)
    return df.where(salt_int < cut)


def balanced_sample(
    df: DataFrame, domain_col: str, id_col: str, count_col: str | None = None
) -> DataFrame:
    """Balanced domain-mixture sampling with DATA-DERIVED rates: every
    domain downsamples to the size of the smallest one (the equal-mixture
    special case of training-data domain reweighting; per-domain target
    weights generalize by scaling the cutoffs). Where
    ``stratified_sample`` takes literal rates, here the rates come from the
    corpus itself: one census aggregation (rows = #domains), a broadcast of
    the per-domain cutoffs back onto the scan, and the same deterministic
    md5-salt keep predicate — still retry/partitioning/engine stable.
    The cutoff is floor(min_count / count * 2^32): two IEEE double ops on
    exact integers, bit-identical across engines, and exactly 2^32 (keep
    everything) for the smallest domain itself.

    Exactly TWO passes over ``df`` at any scale: the census and the sampled
    scan. The tiny census relation (one row per domain) is materialized
    with a lazy localCheckpoint so the min-count probe and the cutoff
    derivation read it instead of re-scanning the corpus (blocks are
    GC-reclaimed once the result is dropped). With ``count_col`` set, each
    output row also carries its domain's total count under that name —
    free from the broadcast join, saving callers (e.g. a kept-vs-total
    census) a third corpus scan."""
    counts = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("__n"))
        .localCheckpoint(eager=False)
    )
    min_n = counts.agg(F.min("__n").alias("__min_n"))
    cuts = counts.crossJoin(F.broadcast(min_n)).select(
        domain_col,
        F.col("__n"),
        F.floor(
            F.col("__min_n").cast("double") / F.col("__n").cast("double")
            * F.lit(4294967296.0)
        ).cast("bigint").alias("__cut"),
    )
    kept = df.join(F.broadcast(cuts), domain_col).where(
        md5_salt(id_col) < F.col("__cut")
    )
    if count_col is not None:
        kept = kept.withColumn(count_col, F.col("__n"))
    return kept.drop("__cut", "__n")


def temperature_mixture_sample(
    df: DataFrame, domain_col: str, id_col: str, count_col: str | None = None
) -> DataFrame:
    """Temperature-reweighted domain mixture at alpha = 0.5 — the standard
    multilingual-training rebalance (sampling probability proportional to
    n_d^alpha: rarer domains upweighted RELATIVE to their size, but not all
    the way to equal mixture). Downsample-only closed form: keep-rate_d =
    sqrt(n_min / n_d) — the geometric mean of equal-mixture
    (``balanced_sample``'s n_min/n_d, alpha=0) and no-op (alpha=1); the
    rarest domain keeps everything and the kept counts follow
    sqrt(n_min * n_d) ~ n_d^0.5.

    alpha is FIXED at 0.5 because sqrt is the only non-trivial power whose
    result is correctly-rounded IEEE in both engines (pow(x, a) carries no
    cross-engine bit guarantee and would flake the oracle hash); the rate
    is sqrt of one exact-integer division, so cutoffs are bit-identical
    everywhere. Same scale shape as balanced_sample: census (rows =
    #domains) -> broadcast cutoffs -> deterministic md5-salt predicate on
    the scan; exactly two corpus passes at any scale."""
    counts = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("__n"))
        .localCheckpoint(eager=False)
    )
    min_n = counts.agg(F.min("__n").alias("__min_n"))
    cuts = counts.crossJoin(F.broadcast(min_n)).select(
        domain_col,
        F.col("__n"),
        F.floor(
            F.sqrt(F.col("__min_n").cast("double") / F.col("__n").cast("double"))
            * F.lit(4294967296.0)
        ).cast("bigint").alias("__cut"),
    )
    kept = df.join(F.broadcast(cuts), domain_col).where(
        md5_salt(id_col) < F.col("__cut")
    )
    if count_col is not None:
        kept = kept.withColumn(count_col, F.col("__n"))
    return kept.drop("__cut", "__n")


def stratified_sample_sql(
    id_sql: str, strata_sql: str, rates: dict[str, float], default_rate: float = 0.0
) -> str:
    """DuckDB twin of stratified_sample's predicate."""
    cases = " ".join(
        f"WHEN {strata_sql} = '{s}' THEN {int(r * 4294967296)}" for s, r in rates.items()
    )
    return (
        f"CAST(('0x' || substring(md5(CAST({id_sql} AS VARCHAR)), 1, 8)) AS UBIGINT) "
        f"< (CASE {cases} ELSE {int(default_rate * 4294967296)} END)"
    )


def latest_version(df: DataFrame, key_cols: list[str], ts_col: str, tiebreak_cols: list[str] = ()) -> DataFrame:
    """F10 — maxVersions=1: keep only the newest cell per key
    (HBaseRDD.configureQuery setMaxVersions(1), HBaseRDD.scala:39-42).
    Implemented as one partial+final aggregation (max over a version struct;
    Spark plans SortAggregate for struct buffers) rather than a window sort:
    map-side combine shrinks the shuffle to one row per key, where a window
    would shuffle every version of every row."""
    order = F.struct(ts_col, *tiebreak_cols)
    others = [c for c in df.columns if c not in key_cols]
    packed = df.select(*key_cols, F.struct(order.alias("__v"), F.struct(*others).alias("__row")).alias("__cell"))
    latest = packed.groupBy(*key_cols).agg(F.max("__cell").alias("__cell"))
    return latest.select(*key_cols, *[F.col(f"__cell.__row.{c}").alias(c) for c in others])


def fixed_size_sample(
    df: DataFrame, strata_col: str, k: int, id_col: str
) -> DataFrame:
    """EXACTLY-k-per-stratum deterministic sample — eval/holdout-set
    construction ("take 1000 docs per language"), where Bernoulli sampling
    (``stratified_sample``) only hits k in expectation. Rows rank within
    their stratum by md5(id) (the retry/engine-stable shuffle key; id
    tiebreak) and the first k survive. The rank<=k filter plans as
    WindowGroupLimit — per-partition top-k pushed before the stratum
    shuffle, so the exchange carries at most k rows per (stratum,
    input-partition), not the corpus. Strata smaller than k keep all their
    rows. Adds ``sample_rank`` (1-based)."""
    from pyspark.sql import Window

    okey = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(okey, id_col)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def es_key_sql(
    weight_sql: str, id_sql: str, dialect: str, seed: str = "es1"
) -> str:
    """THE Efraimidis-Spirakis key expression — the single source of the
    fixed-point construction shared by weighted_sample_topk,
    weighted_group_sample and the DuckDB oracle twin (weighted_sample_sql):
    editing the fold width / seed format / quantization in one consumer but
    not the others would silently desynchronize the samplers from each
    other and from their oracles (the md5_salt discipline, applied here).

        u      = md5(seed:id) folded to [1, 2^20]
        es_key = (20*QUANT - ilog2fp(u)) * 2^20 // weight     (smaller wins)
    """
    from spark_on_hbase_spark.operators.text import DSIR_QUANT, ilog2fp_sql

    if dialect == "spark":
        u = (
            f"(CAST(conv(substring(md5(concat('{seed}:', CAST({id_sql} AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            f" % 1048576 + 1)"
        )
        div = "DIV"
    else:
        u = (
            f"(CAST(('0x' || substring(md5('{seed}:' || CAST({id_sql} AS VARCHAR)), 1, 8)) AS BIGINT)"
            f" % 1048576 + 1)"
        )
        div = "//"
    return (
        f"CAST(((20 * {DSIR_QUANT} - {ilog2fp_sql(u, dialect)}) * 1048576)"
        f" {div} {weight_sql} AS BIGINT)"
    )


def weighted_sample_topk(
    df: DataFrame, weight_col: str, id_col: str, k: int, seed: str = "es1"
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k winners, one pass, no RNG
    coordination — Efraimidis & Spirakis (IPL 2006) reservoir keys, made
    deterministic and cross-engine exact with the md5 salt discipline and
    the no-libm fixed-point log2 (text.ilog2fp_sql).

    E-S: draw u_i ~ U(0,1), rank by u_i^(1/w_i) descending, keep the top
    k — equivalently rank ASCENDING by (-ln u_i)/w_i. Here u_i is the
    md5(seed:id) salt folded to 20 bits (+1, so u in [1, 2^20] and
    ln(u/2^20) = (log2fp(u) - 20*2^20)*ln2 in fixed point), giving the
    exact integer key

        es_key = (20*QUANT - ilog2fp(u)) * 2^20 // w        (smaller wins)

    which is a monotone transform of (-ln u)/w, so the selection law is
    exactly E-S's P(i in sample) ∝ w_i (without replacement). One scan,
    keys computed scan-local, winners via TakeOrdered (per-partition
    partial top-k, then one k-row merge) — the shape that lets a
    1000-executor job draw a weighted holdout from 100 TB in a single
    pass with zero shuffles and retry-stable results (a per-task RNG
    resamples on retry; md5 does not). Ties (same key) break by id.
    Rows with non-positive weight are excluded. Returns (id, weight,
    es_key) ordered by (es_key, id)."""
    return (
        df.where(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col),
            F.expr(es_key_sql(weight_col, id_col, "spark", seed)).alias("es_key"),
        )
        .orderBy("es_key", id_col)
        .limit(k)
    )


def weighted_sample_sql(
    weight_sql: str, id_sql: str, seed: str = "es1"
) -> str:
    """DuckDB twin of weighted_sample_topk's es_key expression."""
    return es_key_sql(weight_sql, id_sql, "duckdb", seed)


def weighted_group_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    id_col: str,
    k: int,
    seed: str = "es1",
) -> DataFrame:
    """Exactly-k-per-group weighted sampling without replacement: E-S keys
    (see weighted_sample_topk) ranked WITHIN each group — the weighted twin
    of fixed_size_sample ("take 1000 docs per language, longer docs more
    likely"). The rank<=k filter is applied on the raw row_number so Spark
    plans WindowGroupLimit: per-partition top-k runs BEFORE the group
    exchange, which therefore carries at most k rows per (group,
    input-partition) — the only corpus-sized work is the scan. Groups
    smaller than k keep all rows. Adds ``sample_rank`` (1-based by es_key,
    id tiebreak)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("es_key", id_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("es_key", F.expr(es_key_sql(weight_col, id_col, "spark", seed)))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )
