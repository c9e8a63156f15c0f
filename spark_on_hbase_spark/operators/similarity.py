"""Similarity search over embedding columns (array<float>).

Two paths, sharing one exact integer kernel:

- brute-force cosine top-k  : the correctness baseline — score every
  (query, candidate) pair, rank per query. Fine for |Q| small; the candidate
  side streams, queries broadcast, so it's one scan of the corpus.
- sign-LSH bucketed ANN     : the 100 TB path — hash every vector to a
  B-bit bucket by the signs of dot products with B deterministic ±1
  hyperplanes; only same-bucket pairs are scored. Bucket count 2^B bounds
  each self-join bucket; recall tunes with B and multi-probe.

Determinism (DuckDB oracle twins must hash-match): embeddings are quantized
``floor(x * 1e6)`` to exact int64 once, so every dot product / norm is exact
integer arithmetic — float summation order never enters — and cosine is a
single IEEE division of exact values. The ±1 hyperplanes are md5-derived
(hyperplane j, dimension d -> sign of a md5 bit), identical in both engines.

All column expressions, JVM-side; no Python UDF in any scoring path. (A
vectorized Pandas-UDF kernel would also work — see multimodal.py for that
pattern — but the expression form keeps whole-stage codegen.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_on_hbase_spark.plans import loop_planner

QUANT = 1_000_000  # fixed-point scale for embedding quantization


def quantize_expr(vec_col: str | Column) -> Column:
    """array<float> -> array<bigint>, floor(x * 1e6). Exact in both engines
    (float widens to double losslessly; floor breaks no ties)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: F.floor(x.cast("double") * QUANT).cast("bigint"))


def quantize_sql(vec_sql: str) -> str:
    return f"list_transform({vec_sql}, x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"


def dot_expr(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors (fold is sequential
    but integer addition is associative — order-independent by construction)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def dot_sql(a_sql: str, b_sql: str) -> str:
    return f"list_sum(list_transform(list_zip({a_sql}, {b_sql}), p -> p[1] * p[2]))"


def norm2_expr(a: Column) -> Column:
    """Exact squared L2 norm of a quantized vector."""
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )


def norm2_sql(a_sql: str) -> str:
    return f"list_sum(list_transform({a_sql}, x -> x * x))"


def cosine_expr(dot: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """cosine = dot / (||a|| * ||b||): IEEE ops over exact integers —
    bit-identical across engines."""
    return dot.cast("double") / (
        F.sqrt(norm2_a.cast("double")) * F.sqrt(norm2_b.cast("double"))
    )


COSINE_SQL = "CAST({dot} AS DOUBLE) / (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)))"


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: score every (query, candidate) pair, keep
    the k best per query (self-matches excluded). Ranking is rank-then-filter,
    which Spark rewrites to a per-partition top-k (WindowGroupLimit) — no full
    sort of the scored space.

    ``queries`` is expected small (it broadcasts); the corpus side streams
    through one scan. Returns (query_id, vec_id, cosine, rank)."""
    from pyspark.sql import Window

    # norms are per-ROW quantities: computing them in the side projections
    # (below the join) evaluates each once per vector instead of once per
    # scored pair — identical values, 2/3 less interpreted HOF work in the
    # pair stage (r11; guide §1.2 "the algorithm first")
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_expr(vec_col).alias("__qv")
    ).withColumn("__qn", norm2_expr(F.col("__qv")))
    c = candidates.select(
        F.col(id_col), quantize_expr(vec_col).alias("__cv")
    ).withColumn("__cn", norm2_expr(F.col("__cv")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            id_col,
            cosine_expr(
                dot_expr(F.col("__qv"), F.col("__cv")),
                F.col("__qn"),
                F.col("__cn"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# sign-LSH bucketing
# ---------------------------------------------------------------------------


def _plane_sign(j: int, d: int) -> int:
    """Deterministic ±1 hyperplane component: parity of the first hex char of
    md5('<j>:<d>'). Python-side constant generation — both engines receive the
    same literal hyperplanes, no cross-engine hash needed at query time."""
    import hashlib

    h = hashlib.md5(f"{j}:{d}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def plane_matrix(num_planes: int, dim: int) -> list[list[int]]:
    return [[_plane_sign(j, d) for d in range(dim)] for j in range(num_planes)]


def bucket_expr(qvec: Column, planes: list[list[int]]) -> Column:
    """B-bit sign bucket of a quantized vector: bit j = [dot(vec, plane_j) > 0].
    Each plane dot is an exact integer combination (components are ±1).

    Measured note (round 3): an unrolled ``2 * sum(v[pos_j]) - total``
    straight-line form was tried and is ~3x SLOWER than this
    ``zip_with``+``aggregate`` form at 48 planes x 64 dims — the ~1,500-term
    expression tree blows the generated-method budget and falls back to
    interpreted evaluation, while the higher-order form stays in Catalyst's
    specialized array loops. Keep the HOF form."""
    bucket = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        dot_j = F.aggregate(
            F.zip_with(
                qvec,
                F.lit(plane),  # one array literal, not 64 scalar nodes
                lambda x, s: x * s.cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot_j > 0, F.lit(2**j).cast("bigint")).otherwise(F.lit(0))
    return bucket


def bucket_sql(qvec_sql: str, planes: list[list[int]]) -> str:
    terms = []
    for j, plane in enumerate(planes):
        plane_lit = "[" + ", ".join(str(s) for s in plane) + "]"
        dot_j = f"list_sum(list_transform(list_zip({qvec_sql}, {plane_lit}), p -> p[1] * p[2]))"
        terms.append(f"(CASE WHEN {dot_j} > 0 THEN {2**j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def clustered_corpus(
    spark,
    n: int,
    n_clusters: int = 32,
    dim: int = 64,
    scale: int = 6,
    noise: int = 2,
    tag: str = "cc",
) -> DataFrame:
    """Deterministic synthetic CLUSTERED embedding corpus — the regime real
    embedding models produce (SCALE.md §ANN: the parquet fixture's
    near-random vectors are the adversarial floor; production corpora
    cluster, which is what makes sub-linear ANN work at all). Vector i
    belongs to cluster c = i mod n_clusters; every component is a small
    INTEGER:

        vec(i)[j] = center(c)[j] + eta(i, j)
        center(c)[j] = +-scale   (sign of an md5 nibble of 'tag-c-c-j')
        eta(i, j) in [-noise, +noise]  (md5 nibble of 'tag-n-i-j', mod)

    Intra-cluster cosine ~ scale^2*dim / (scale^2*dim + E[eta^2]*dim)
    (~0.93 at the defaults), inter-cluster ~ N(0, 1/sqrt(dim)) — strong,
    tunable separation. All-integer values mean quantization is exact and
    every downstream dot/norm replays bit-identically, so the corpus is
    ORACLE-REPLAYABLE: ``clustered_corpus_sql`` derives the same rows in
    DuckDB from the same md5 bits (no fixture file, no literal matrices).
    Generation is pure column expressions over ``spark.range(n)`` — at 100
    TB you'd read a real corpus instead; this exists so clustered-regime
    recall is measurable and gradable."""
    period = 2 * noise + 1
    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    c = (F.col("vec_id") % n_clusters).cast("string")

    def nib(s: Column) -> Column:
        return F.conv(F.substring(F.md5(s), 1, 1), 16, 10).cast("int")

    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.when(
                nib(F.concat_ws("-", F.lit(f"{tag}-c"), c, j.cast("string"))) < 8,
                F.lit(scale),
            ).otherwise(F.lit(-scale))
            + nib(
                F.concat_ws(
                    "-", F.lit(f"{tag}-n"), F.col("vec_id").cast("string"),
                    j.cast("string"),
                )
            )
            % period
            - noise
        ).cast("float"),
    )
    return ids.select("vec_id", emb.alias("embedding"))


def clustered_corpus_sql(
    n: int,
    n_clusters: int = 32,
    dim: int = 64,
    scale: int = 6,
    noise: int = 2,
    tag: str = "cc",
) -> str:
    """DuckDB twin of ``clustered_corpus``: a CTE body producing identical
    (vec_id, embedding) rows from the same md5 nibbles. Single-hex-digit
    parsing is instr('0123..f', ch)-1 here vs conv(ch, 16, 10) on the
    Spark side — different spellings, the same value."""
    period = 2 * noise + 1

    def nib(s: str) -> str:
        return f"(instr('0123456789abcdef', substr(md5({s}), 1, 1)) - 1)"

    ctr = nib(
        f"'{tag}-c-' || CAST(i % {n_clusters} AS VARCHAR) || '-' || CAST(j AS VARCHAR)"
    )
    eta = nib(f"'{tag}-n-' || CAST(i AS VARCHAR) || '-' || CAST(j AS VARCHAR)")
    return (
        f"SELECT i AS vec_id, list_transform(range({dim}), j -> "
        f"CAST(CASE WHEN {ctr} < 8 THEN {scale} ELSE -{scale} END "
        f"+ ({eta} % {period}) - {noise} AS FLOAT)) AS embedding "
        f"FROM (SELECT unnest(range({n})) AS i)"
    )


LSH_PLANE_POOL = 16  # per-table plane pool width for the adaptive-B scheme


def plane_dots_sql(vec_sql: str, planes: list[list[int]]) -> str:
    """DuckDB list of per-plane exact integer dots — the oracle twin of
    ``plane_dots_expr``."""
    items = []
    for plane in planes:
        lit = "[" + ", ".join(str(s) for s in plane) + "]"
        items.append(
            f"list_sum(list_transform(list_zip({vec_sql}, {lit}), p -> p[1] * p[2]))"
        )
    return "[" + ", ".join(items) + "]"


def adaptive_num_planes_sql(
    count_sql: str, offset: int = -1, floor: int = 6, cap: int = LSH_PLANE_POOL
) -> str:
    """DuckDB twin of ``adaptive_num_planes`` — IEEE log2 of an integer is
    the same double in both engines, so the derived B matches bit-for-bit."""
    return (
        f"GREATEST({floor}, LEAST({cap}, "
        f"CAST(ceil(log2(GREATEST({count_sql}, 2))) AS INT) + {offset}))"
    )


def table_planes(num_tables: int, num_planes: int, dim: int) -> list[list[list[int]]]:
    """``num_tables`` independent deterministic hyperplane sets — slices of
    one big plane matrix, so table 0 with L=1 equals the single-table
    planes (back-compatible bucketing)."""
    allp = plane_matrix(num_tables * num_planes, dim)
    return [allp[t * num_planes : (t + 1) * num_planes] for t in range(num_tables)]




def adaptive_num_planes(
    n_corpus: int, offset: int = -1, floor: int = 6, cap: int = LSH_PLANE_POOL
) -> int:
    """Scale-adaptive LSH bucket width: B = clamp(ceil(log2(n)) + offset).

    Fixed B is the measured scale-killer of bucketed ANN (SCALE.md §30x):
    when corpus and query batch grow together, candidate mass per query is
    ~n / 2^B, so total work is ~n^2 / 2^B — quadratic unless B tracks
    log2(n). With B = ceil(log2 n) + offset, every bucket holds ~2^-offset
    expected vectors per table and candidate cost per query stays O(probes),
    flat in n. The 30x probe measured the law directly: at 30x data, fixed
    B=10 grew 58x warm while B=14 (the rule's answer) ran 6x faster than
    B=10 at 159s -> 27s.

    The rule is IEEE-exact cross-engine: log2 of an integer < 2^53 is the
    same double in Python, Spark and DuckDB, so the oracle replays
    ``GREATEST(floor, LEAST(cap, CAST(ceil(log2(n)) AS INT) + offset))``
    bit-identically from its own COUNT(*)."""
    import math

    return max(floor, min(cap, math.ceil(math.log2(max(n_corpus, 2))) + offset))


def pooled_table_planes(
    num_tables: int, num_planes: int, dim: int, pool: int = LSH_PLANE_POOL
) -> list[list[list[int]]]:
    """B-INDEPENDENT table planes: table t's plane j is row t*pool + j of
    the one deterministic plane matrix, regardless of B — so a table's
    B-plane set is always the first B planes of its fixed ``pool``-wide
    slice. Consequence: the B-bit bucket equals the pool-width bucket
    masked to its low B bits (bit j comes from plane j), which is what lets
    a RUNTIME B — derived from a corpus count — reuse one stored plane
    configuration, and lets the DuckDB oracle replay adaptive B as
    ``pool_bucket & ((1 << b) - 1)`` without regenerating plane literals.
    (``table_planes`` slices chunks of B, so its tables CHANGE with B —
    unusable under an adaptive rule.)"""
    if num_planes > pool:
        raise ValueError(f"num_planes {num_planes} exceeds plane pool {pool}")
    return [tp[:num_planes] for tp in table_planes(num_tables, pool, dim)]


def _bucket_sql_spark(vec_sql: str, planes: list[list[int]]) -> str:
    """Spark-SQL transcription of ``bucket_expr`` (same zip_with/aggregate
    shapes, same exact integer arithmetic) for single-parse emission."""
    terms = ["CAST(0 AS BIGINT)"]
    for j, plane in enumerate(planes):
        lit = "array(" + ",".join(str(s) for s in plane) + ")"
        dot_j = (
            f"aggregate(zip_with({vec_sql}, {lit}, "
            f"(x, s) -> x * CAST(s AS BIGINT)), CAST(0 AS BIGINT), "
            f"(acc, v) -> acc + v)"
        )
        terms.append(
            f"(CASE WHEN {dot_j} > 0 THEN CAST({2 ** j} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    return "(" + " + ".join(terms) + ")"


def _table_bucket_rows(vcol_name: str, tables: list[list[list[int]]]) -> Column:
    """Explode a quantized vector to one (table, bucket) struct per hash
    table — all tables ride one scan of the vector column. Emitted as ONE
    generated-SQL parse (r12): the Column-by-Column construction cost ~1
    py4j round-trip per expression node — measured ~6s of driver time per
    ``lsh_bucket`` call at L=6 x B=10 x 64 dims against ~0.5s of actual
    execution at sf0.1 — while a single parse is milliseconds. The parsed
    expressions are the same zip_with/aggregate shapes (values pinned by
    the oracle hash gate and the plan-equality test)."""
    vq = "`" + vcol_name.replace("`", "``") + "`"
    structs = ", ".join(
        f"named_struct('__t', {t}, '__bucket', {_bucket_sql_spark(vq, planes)})"
        for t, planes in enumerate(tables)
    )
    return F.expr(f"explode(array({structs}))")


def lsh_bucket(
    vectors: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 1,
    plane_pool: int | None = None,
) -> DataFrame:
    """Corpus-side LSH assignment: (id, quantized vector, table, bucket) —
    one row per (vector, hash table). At 100 TB this is computed ONCE and
    stored partitioned by (table, bucket) (the layout every query batch
    joins against); locally, memoize/persist it and pass to ``lsh_topk`` via
    ``corpus_bucketed`` so repeated query batches skip re-bucketing.

    ``plane_pool``: use the B-independent pooled plane assignment
    (``pooled_table_planes``) so ``num_planes`` may be derived at
    index-build time from the corpus count (``adaptive_num_planes``) and a
    future re-index at a bigger B keeps every already-assigned low bit."""
    tables = (
        pooled_table_planes(num_tables, num_planes, dim, plane_pool)
        if plane_pool is not None
        else table_planes(num_tables, num_planes, dim)
    )
    v = vectors.select(F.col(id_col), quantize_expr(vec_col).alias("__cv"))
    return v.select(id_col, "__cv", _table_bucket_rows("__cv", tables).alias("__tb")).select(
        id_col, "__cv", "__tb.__t", "__tb.__bucket"
    )


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 1,
    corpus_bucketed: DataFrame | None = None,
    probe_bits: int = 0,
    plane_pool: int | None = None,
) -> DataFrame:
    """ANN top-k: score only candidates sharing a sign-LSH bucket with the
    query. The bucket id is the shuffle/join key — at 100 TB the corpus
    partitions by bucket once (reusable across query batches), and each
    query touches ~num_tables x |corpus| / 2^B rows instead of all of them.

    ``num_tables`` is the standard AND-OR LSH construction: a true neighbor
    at per-plane collision probability p is found with probability
    1 - (1 - p^B)^L, so recall tunes with L at candidate cost linear in L.
    A single 8-plane table yields ~0.02 recall@10 on near-random vectors
    (measured, SCALE.md §ANN) — multi-table is what makes sign-LSH an
    actual ANN path rather than a lottery. All L buckets ride ONE corpus
    scan: each side explodes to (table, bucket) rows and joins on the
    composite key.

    ``probe_bits=1`` adds query-side multi-probe (Lv et al., VLDB'07): each
    query also probes every bucket at Hamming distance 1 (its B single-bit
    sign flips) in each table — B+1 probes/table. The STORED corpus layout
    is untouched (probing is pure query fanout), so one L-table index
    serves many recall/cost points: with bigger B (smaller buckets) and
    smaller L, probing reaches the recall of a larger-L index at a fraction
    of the candidate mass AND an L-fold smaller index. Measured frontier in
    SCALE.md §ANN.

    Duplicate candidate pairs (colliding in >1 probe) are deduplicated
    before ranking so a vector can't occupy two ranks; dedup happens AFTER
    scoring, on (query_id, id, cosine) rows (~3 scalars), not on rows still
    carrying both 64-dim vectors — the duplicate scores are value-identical
    so max() is deterministic.

    ``corpus_bucketed``: a precomputed ``lsh_bucket(candidates, ...)``
    relation (same plane config!) — pass the persisted/stored assignment so
    repeated query batches reuse it instead of re-bucketing the corpus
    inside every query plan.

    ``plane_pool``: pooled (B-independent) plane assignment — pass the same
    value used to build ``corpus_bucketed``. This is how an ADAPTIVE
    ``num_planes`` (``adaptive_num_planes`` from the corpus count) stays
    consistent between the stored index and the query side."""
    from pyspark.sql import Window

    tables = (
        pooled_table_planes(num_tables, num_planes, dim, plane_pool)
        if plane_pool is not None
        else table_planes(num_tables, num_planes, dim)
    )
    # the query norm is hoisted BELOW the probe fanout (once per query, not
    # per probe row or per candidate pair) and the corpus norm onto the
    # bucketed entries (once per entry, not per pair) — identical values,
    # the per-pair stage computes only the dot (r11)
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_expr(vec_col).alias("__qv")
    ).withColumn("__qn", norm2_expr(F.col("__qv")))
    qb = q.select(
        "query_id", "__qv", "__qn",
        _table_bucket_rows("__qv", tables).alias("__tb"),
    ).select("query_id", "__qv", "__qn", "__tb.__t", "__tb.__bucket")
    if probe_bits:
        if probe_bits not in (1, 2):
            raise ValueError(f"probe_bits must be 0, 1 or 2, got {probe_bits}")
        # all masks of popcount <= probe_bits: 1 + B (+ B*(B-1)/2 for 2-bit)
        # probes per table — pure query-side fanout, the stored bucketing is
        # unchanged. Distinct XOR masks yield distinct buckets, so the
        # explode itself never duplicates a (table, bucket) probe.
        from itertools import combinations

        mask_vals = [0]
        for r in range(1, probe_bits + 1):
            mask_vals += [
                sum(1 << b for b in bits)
                for bits in combinations(range(num_planes), r)
            ]
        masks = F.array(*[F.lit(m).cast("bigint") for m in mask_vals])
        qb = qb.select(
            "query_id", "__qv", "__qn", "__t", "__bucket",
            F.explode(masks).alias("__m"),
        ).select(
            "query_id", "__qv", "__qn", "__t",
            F.col("__bucket").bitwiseXOR(F.col("__m")).alias("__bucket"),
        )
    cb = (
        corpus_bucketed
        if corpus_bucketed is not None
        else lsh_bucket(candidates, num_planes, dim, id_col, vec_col, num_tables)
    ).withColumn("__cn", norm2_expr(F.col("__cv")))
    cand = (
        F.broadcast(qb)
        .join(cb, ["__t", "__bucket"])
        .where(F.col("query_id") != F.col(id_col))
    )
    scored = cand.select(
        "query_id",
        id_col,
        cosine_expr(
            dot_expr(F.col("__qv"), F.col("__cv")),
            F.col("__qn"),
            F.col("__cn"),
        ).alias("cosine"),
    )
    if num_tables > 1 or probe_bits:
        scored = scored.groupBy("query_id", id_col).agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _pow2(c: Column) -> Column:
    """2^c for a small non-negative column — exact (double pow is exact for
    integer exponents below 2^52, then cast)."""
    return F.pow(F.lit(2.0), c.cast("double")).cast("bigint")


def plane_dots_expr(qvec_col: str, planes: list[list[int]]) -> Column:
    """Per-plane exact integer dots of a quantized vector with each ±1
    hyperplane, as an array — the margin signal for query-directed probing
    (the sign gives the bucket bit; |dot| is the distance to the plane).

    Takes the vector COLUMN NAME and emits the whole array as ONE
    generated-SQL expression: the Column-by-Column form cost ~1 py4j
    round-trip per node — at L=6 tables x 16 planes x 64 dims that was
    ~29k round-trips (~5s) of pure construction per query build (r11
    profile). The SQL parses JVM-side in milliseconds; the analyzed plan
    is identical (one ArrayType literal per plane, exact bigint dots)."""
    per_plane = [
        "aggregate(zip_with(`{q}`, array({vals}), (x, s) -> x * CAST(s AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)".format(
            q=qvec_col.replace("`", "``"),
            vals=",".join(str(int(v)) for v in plane),
        )
        for plane in planes
    ]
    return F.expr("array(" + ", ".join(per_plane) + ")")


def lsh_margin_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 1,
    corpus_bucketed: DataFrame | None = None,
    probe_width: int = 10,
    probe_total: int = 224,
    plane_pool: int = LSH_PLANE_POOL,
    return_candidates: bool = False,
) -> DataFrame:
    """ANN top-k with QUERY-DIRECTED ordered multi-probe (the full Lv et
    al. VLDB'07 construction, upgrading ``lsh_topk``'s blind ±2-bit
    probing): per query and hash table, rank the probe buckets by how
    likely they are to hold missed neighbors — the summed |margin| of the
    flipped planes (a neighbor most plausibly lands across the planes the
    query itself barely cleared) — and spend a GLOBAL budget of
    ``probe_total`` probes per query on the best (table, bucket) pairs
    across all tables. Tables where the query has weak margins get more of
    the budget, which measures ~2x the recall of blind 2-bit probing at
    the SAME candidate fraction (SCALE.md §ANN: 0.657 vs 0.333 at ~21% on
    the adversarial fixture corpus).

    Construction per (query, table): per-plane exact integer dots; the
    ``probe_width`` smallest-|margin| planes (ties by plane index, via a
    bigint-encoded ``|dot|*32 + j`` sort — no struct-sort semantics to
    match cross-engine); all 2^min(probe_width, B) sign-flip subsets of
    those planes scored by summed flipped |margin|. The global top-T
    selection happens IN THE ARRAY DOMAIN per query row (concat the
    per-table probe arrays, array_sort by the (sc, t, bucket) struct,
    slice T) — zero shuffles on the query side; the oracle's window
    ``ORDER BY sc, t, pbucket`` is the same ordering. Everything is exact
    integer arithmetic, so the probe selection replays bit-identically.

    Scale posture: probing remains PURE QUERY-SIDE FANOUT — the stored
    (table, bucket)-partitioned corpus index (``lsh_bucket`` with the same
    ``plane_pool``) is untouched, and the per-query cost is O(L * 2^w)
    probe scoring + ``probe_total`` bucket lookups regardless of corpus
    size. Combined with ``adaptive_num_planes`` (B ~ log2 n) the candidate
    mass per query stays ~probe_total * n / 2^B = O(probe_total) vectors,
    flat in n."""
    from pyspark.sql import Window

    tables = pooled_table_planes(num_tables, num_planes, dim, plane_pool)
    w_eff = min(probe_width, num_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_expr(vec_col).alias("__qv")
    )
    # per table: dots, then bucket (bit j = sign of dot j) and the weak list
    # (planes by ascending |margin|, encoded |dot|*32 + j: exact bigint,
    # deterministic tie on plane index) — all per-row array expressions
    qd = q.select(
        "query_id",
        "__qv",
        *[
            plane_dots_expr("__qv", planes).alias(f"__d{t}")
            for t, planes in enumerate(tables)
        ],
    )
    # The per-table bucket / weak-plane / probe-subset builders are emitted
    # as generated SQL (one parse each) for the same construction-cost
    # reason as plane_dots_expr — the analyzed plans are identical to the
    # Column forms they replace (same literals, same _pow2 = CAST(POW(2.0,
    # CAST(j AS DOUBLE)) AS BIGINT) shape, same default struct ordering).
    def _bucket_of(t: int) -> Column:
        return F.expr(
            f"aggregate(sequence(0, {num_planes - 1}), CAST(0 AS BIGINT), "
            f"(acc, j) -> acc + (CASE WHEN element_at(__d{t}, j + 1) > 0 "
            f"THEN CAST(POW(2.0D, CAST(j AS DOUBLE)) AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END))"
        )

    def _weak_of(t: int) -> Column:
        return F.expr(
            f"slice(array_sort(transform(sequence(0, {num_planes - 1}), "
            f"j -> abs(element_at(__d{t}, j + 1)) * 32 + j)), 1, {w_eff})"
        )

    qd = qd.select(
        "query_id",
        "__qv",
        *[_bucket_of(t).alias(f"__b{t}") for t in range(len(tables))],
        *[_weak_of(t).alias(f"__w{t}") for t in range(len(tables))],
    )

    # all 2^w flip subsets of each table's weak planes, scored by summed
    # flipped margin; global top-T across tables selected by one
    # array_sort+slice over the concatenated probe structs (sc, t, b) —
    # no window, no shuffle on the query side.
    #
    # Subset enumeration is SUBSET-SUM DP in the array domain: fold the
    # weak list, doubling an accumulator of (score, mask) pairs per plane
    # (acc ∪ {p + (margin_j, bit_j)}). Total work is O(2^w) struct builds
    # per table, vs O(2^w * 2w) interpreted aggregate steps for the naive
    # per-subset scoring — measured ~25x faster probe generation at w=10
    # (the naive form dominated the whole query at ~5s for 21 query rows;
    # nested HOFs evaluate interpreted, not codegen'd). Generation order
    # differs from mask-integer order, but the global selection sorts by
    # (sc, t, bucket), so the selected probe SET — and the oracle — are
    # identical.
    def _probes_of(t: int) -> Column:
        return F.expr(
            f"transform("
            f"aggregate(__w{t}, "
            f"array(named_struct('sc', CAST(0 AS BIGINT), 'm', CAST(0 AS BIGINT))), "
            f"(acc, e) -> concat(acc, transform(acc, p -> named_struct("
            f"'sc', p.sc + CAST(FLOOR(e / 32) AS BIGINT), "
            f"'m', p.m + CAST(POW(2.0D, CAST((e % 32) AS DOUBLE)) AS BIGINT))))), "
            f"p -> named_struct('sc', p.sc, 't', CAST({t} AS BIGINT), "
            f"'b', __b{t} ^ p.m))"
        )

    probes = F.slice(
        F.array_sort(F.concat(*[_probes_of(t) for t in range(len(tables))])),
        1,
        probe_total,
    )
    # norms hoisted below the probe fanout / onto the bucketed entries —
    # once per query row and per corpus entry, never per candidate pair
    # (identical values; r11)
    qp = (
        qd.select(
            "query_id", "__qv",
            norm2_expr(F.col("__qv")).alias("__qn"),
            F.explode(probes).alias("__p"),
        )
        .select(
            "query_id",
            "__qv",
            "__qn",
            F.col("__p.t").cast("int").alias("__t"),
            F.col("__p.b").alias("__bucket"),
        )
    )
    cb = (
        corpus_bucketed
        if corpus_bucketed is not None
        else lsh_bucket(
            candidates, num_planes, dim, id_col, vec_col, num_tables, plane_pool
        )
    ).withColumn("__cn", norm2_expr(F.col("__cv")))
    cand = (
        F.broadcast(qp)
        .join(cb, ["__t", "__bucket"])
        .where(F.col("query_id") != F.col(id_col))
    )
    if return_candidates:  # frontier instrumentation: the scored-pair set
        return cand.select("query_id", id_col).distinct()
    scored = cand.select(
        "query_id",
        id_col,
        cosine_expr(
            dot_expr(F.col("__qv"), F.col("__cv")),
            F.col("__qn"),
            F.col("__cn"),
        ).alias("cosine"),
    )
    scored = scored.groupBy("query_id", id_col).agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def cosine_pandas_udf():
    """Vectorized Pandas-UDF cosine kernel over two quantized int64 vector
    columns — the Arrow-batched alternative to the expression kernel
    (cosine_expr), for callers that prefer numpy. Bit-identical to the
    expression path: int64 dot/norms are exact, the final ops are the same
    IEEE doubles (asserted in tests/test_pipeline.py). Expressions remain
    the default — they stay inside codegen; this exists as the sanctioned
    vectorized escape hatch pattern."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a, b)):
            xv = np.asarray(x, dtype=np.int64)
            yv = np.asarray(y, dtype=np.int64)
            dot = int(np.dot(xv, yv))
            nx = int(np.dot(xv, xv))
            ny = int(np.dot(yv, yv))
            out[i] = float(dot) / (np.sqrt(float(nx)) * np.sqrt(float(ny)))
        return pd.Series(out)

    return _cos


def dot_pandas_udf():
    """Vectorized Arrow dot kernel over two quantized int64 vector columns
    — the batched alternative to the interpreted ``dot_expr`` HOF for the
    pair stages whose per-pair expression work dominates (guide §4.2:
    hand whole batches to numpy). BIT-IDENTICAL to the expression path:
    the quantized components are |x| <= 1e6, so 64-term int64 dots are
    exact in both engines (asserted in tests/test_pipeline.py). The whole
    batch is stacked into one (n, dim) matrix and reduced with a single
    einsum — no per-row Python."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="int64")
        av = np.stack([np.asarray(x, dtype=np.int64) for x in a])
        bv = np.stack([np.asarray(x, dtype=np.int64) for x in b])
        return pd.Series(np.einsum("ij,ij->i", av, bv))

    return _dot


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    qvec_col: str = "__v",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    by exact quantized squared-L2 distance (ties broken by centroid id).
    Centroids broadcast (there are few); one scan of the corpus. Returns
    (id, qvec, centroid_id)."""
    c = centroids.select(
        F.col(id_col).alias("__cid"), F.col(qvec_col).alias("__cv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col(qvec_col), F.col("__cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = vectors.crossJoin(F.broadcast(c)).select(
        id_col, qvec_col, "__cid", d2.alias("__d2")
    )
    best = scored.groupBy(id_col).agg(
        F.min_by(F.struct("__cid", qvec_col), F.struct("__d2", "__cid")).alias("__b")
    )
    return best.select(
        id_col, F.col(f"__b.{qvec_col}").alias(qvec_col), F.col("__b.__cid").alias("centroid_id")
    )


IVF_D2_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2])))"
)


def ivf_probe(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    qvec_col: str = "__v",
) -> DataFrame:
    """Multi-probe coarse quantization: each vector gets its ``nprobe``
    nearest centroids (exact quantized L2, ties by centroid id) — one row per
    (vector, probed cell). The recall knob of IVF: a query near a cell
    boundary also searches the adjacent cells instead of missing neighbors
    assigned across it. Meant for the (small) query side; the corpus keeps
    its single-cell assignment (ivf_assign), so cost scales as
    nprobe x |corpus|/|cells| per query. The per-vector ranking window runs
    over |centroids| rows per vector — fine exactly because the probe side
    is small; corpus-side assignment stays the windowless min_by
    aggregation."""
    from pyspark.sql import Window

    c = centroids.select(F.col(id_col).alias("__cid"), F.col(qvec_col).alias("__cv"))
    d2 = F.aggregate(
        F.zip_with(F.col(qvec_col), F.col("__cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = vectors.crossJoin(F.broadcast(c)).select(
        id_col, qvec_col, "__cid", d2.alias("__d2")
    )
    w = Window.partitionBy(id_col).orderBy("__d2", "__cid")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= nprobe)
        .select(id_col, qvec_col, F.col("__cid").alias("centroid_id"))
    )


def kmeans_refine(
    vectors: DataFrame,
    init_centroids: DataFrame,
    iters: int = 5,
    id_col: str = "vec_id",
    qvec_col: str = "__v",
    adaptive: bool = True,
) -> DataFrame:
    """Lloyd's k-means over quantized vectors, DataFrame-native: assign
    (exact int L2 via ivf_assign) -> recompute centroids as element-wise
    FLOOR-DIVISION means (posexplode -> per-(cell, dim) exact integer
    sum/count -> floor-div -> rebuild array) -> repeat. Empty cells keep
    their previous centroid. Returns (vec_id=cell id, __v=centroid) ready
    for ivf_topk — upgrading IVF from seed centroids to trained ones
    without changing the query path.

    Centroid components stay EXACT INTEGERS end-to-end (sum of bigints,
    then floor division via the pmod identity) so every iteration is
    bit-identical across Spark, DuckDB and Python — a rounded double mean
    would diverge (Spark rounds HALF_UP, DuckDB half-even) and a k-means
    divergence compounds per iteration. That exactness is what lets the
    graded query put the trained-centroid path under the oracle hash.

    Per iteration: one broadcast-assign scan + one (cell, dim)-key
    aggregation — both partial+final, no driver-side state; centroids are
    eagerly persisted so the loop's plan stays O(1), and superseded
    iterations are released immediately.

    ``adaptive`` defaults True (r12): unlike the BSP frontier loops (whose
    cached-state statistics make AQE's re-planning pure latency —
    loop_planner's rationale), each Lloyd iteration runs 3-4 fresh
    shuffles over centroid-sized relations, and AQE's partition coalescing
    collapses their fixed-width task waves; measured 2x on the 2-iteration
    index builds (8.5/5.3s -> 4.0/4.0s same-session A/B at sf0.1), and at
    cluster scale coalescing is the standard posture (guide §2.2)."""
    centroids = init_centroids.select(
        F.col(id_col), F.col(qvec_col)
    ).persist()
    centroids.count()
    prev_ckpt = centroids
    with loop_planner(vectors, adaptive):
        for _ in range(iters):
            assigned = ivf_assign(vectors, centroids, id_col, qvec_col)
            dims = assigned.select(
                F.col("centroid_id"), F.posexplode(F.col(qvec_col)).alias("__d", "__x")
            )
            means = (
                dims.groupBy("centroid_id", "__d")
                .agg(F.sum("__x").alias("__s"), F.count("*").alias("__n"))
                # exact floor division: (s - pmod(s, n)) is divisible by n,
                # so the integer `div` is the mathematical floor for any sign
                .withColumn("__m", F.expr("(__s - pmod(__s, __n)) div __n"))
                .groupBy("centroid_id")
                .agg(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("__d", "__m"))),
                        lambda s: s["__m"].cast("bigint"),
                    ).alias(qvec_col)
                )
                .select(F.col("centroid_id").alias(id_col), qvec_col)
            )
            # empty cells: keep the old centroid
            kept = centroids.join(
                means.select(F.col(id_col)), id_col, "left_anti"
            )
            centroids = means.unionByName(kept).persist()
            centroids.count()  # materialize before releasing the predecessor
            prev_ckpt.unpersist()
            prev_ckpt = centroids
    return centroids


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    centroids_quantized: bool = False,
    corpus_assigned: DataFrame | None = None,
    queries_assigned: DataFrame | None = None,
    return_candidates: bool = False,
) -> DataFrame:
    """IVF ANN top-k: corpus partitioned by nearest-centroid cell; each
    query probes its ``nprobe`` nearest cells. At 100 TB the cell id is the
    storage partition key — a query touches ~nprobe x |corpus|/|centroids|
    rows, and the assignment pass is reusable across query batches.
    Centroids are any small deterministic seed set (a k-means refinement
    drops in without changing the query path); recall tunes with nprobe
    (boundary queries search adjacent cells too) without touching the
    corpus layout.

    ``centroids_quantized``: pass True when ``centroids`` already carries
    quantized ``__v`` arrays (e.g. ``kmeans_refine`` output) — quantizing
    twice would corrupt them.

    ``corpus_assigned`` / ``queries_assigned``: precomputed ``ivf_assign``
    relations ((id, __v, centroid_id) — same centroid set!) so repeated
    query batches reuse the STORED cell assignment instead of re-deriving
    it inside every query plan — the IVF twin of ``lsh_topk``'s
    ``corpus_bucketed``. When the query set is a subset of the corpus, its
    nprobe=1 probe rows ARE its rows in the stored assignment, so both
    sides of the cell join read one shared relation (one scan / cache).
    ``queries_assigned`` requires nprobe=1 (it IS the 1-cell assignment);
    pass ``candidates``/``queries`` as None when the corresponding
    *_assigned relation is given. ``centroids`` may be None only when BOTH
    assigned relations are given (assignment needs the centroid set)."""
    from pyspark.sql import Window

    if queries_assigned is not None and nprobe != 1:
        raise ValueError("queries_assigned is a 1-cell assignment; nprobe must be 1")
    if centroids is None and (corpus_assigned is None or queries_assigned is None):
        raise ValueError(
            "centroids required unless both corpus_assigned and queries_assigned are given"
        )
    if corpus_assigned is None or queries_assigned is None:
        cq = (
            centroids.select(F.col(id_col), F.col("__v"))
            if centroids_quantized
            else centroids.select(F.col(id_col), quantize_expr(vec_col).alias("__v"))
        )
    if corpus_assigned is not None:
        corpus_cells = corpus_assigned
    else:
        corpus = candidates.select(F.col(id_col), quantize_expr(vec_col).alias("__v"))
        corpus_cells = ivf_assign(corpus, cq, id_col, "__v")
    if queries_assigned is not None:
        probe = queries_assigned
    else:
        qs = queries.select(F.col(id_col), quantize_expr(vec_col).alias("__v"))
        probe = ivf_assign(qs, cq, id_col, "__v") if nprobe == 1 else ivf_probe(
            qs, cq, nprobe, id_col, "__v"
        )
    # norms hoisted onto the cell projections — once per query/corpus row,
    # never per scored pair (identical values; r11)
    query_cells = probe.select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__qv"), "centroid_id"
    ).withColumn("__qn", norm2_expr(F.col("__qv")))
    joined = (
        F.broadcast(query_cells)
        .join(
            corpus_cells.withColumn("__cn", norm2_expr(F.col("__v"))),
            "centroid_id",
        )
        .where(F.col("query_id") != F.col(id_col))
    )
    if return_candidates:  # frontier instrumentation: the scored-pair set
        return joined.select("query_id", id_col).distinct()
    scored = (
        joined
        .select(
            "query_id",
            id_col,
            cosine_expr(
                dot_expr(F.col("__qv"), F.col("__v")),
                F.col("__qn"),
                F.col("__cn"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.98,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket self-join (the
    candidate bound), exact quantized cosine verify. Same shape as the
    minhash/simhash dedups in dedup.py — bucket, then verify candidates only."""
    planes = plane_matrix(num_planes, dim)
    # the norm is a per-vector quantity: compute it once per row below the
    # bucket self-join instead of twice per candidate pair (identical
    # values; r11)
    v = vectors.select(F.col(id_col), quantize_expr(vec_col).alias("__v")).withColumn(
        "__bucket", bucket_expr(F.col("__v"), planes)
    ).withColumn("__n2", norm2_expr(F.col("__v")))
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("__va"),
        F.col("__n2").alias("__na"), "__bucket",
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"),
        F.col("__n2").alias("__nb"), "__bucket",
    )
    return (
        a.join(b, "__bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_expr(
                dot_expr(F.col("__va"), F.col("__vb")),
                F.col("__na"),
                F.col("__nb"),
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    assigned: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    qvec_col: str = "__v",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication as CLUSTER-SCOPED embedding near-dup removal — k-means
    cluster the corpus, compare pairs only WITHIN a cluster (the paper's
    central trick: semantic duplicates land in the same cluster, so the
    candidate bound is the cluster, never the corpus), and among each
    near-dup set keep the entry with the LOWEST cosine similarity to its
    cluster centroid (the paper's diversity-preserving keep policy).

    The greedy paper algorithm is order-dependent; this is its
    deterministic dominance form: ``x`` is dropped iff some same-cluster
    neighbor ``y`` has pair-cosine >= threshold AND strictly lower
    centroid-cosine (ties by smaller id). Every comparison is IEEE ops
    over exact quantized integers (cosine_expr), so the verdict is
    bit-identical across engines and the whole operator sits under the
    value-hash oracle.

    Inputs are the TRAINED IVF index pieces (``ivf_assign`` /
    ``kmeans_refine`` — the memoized index build the ANN queries already
    share): ``assigned`` = (id, qvec, centroid_id), ``centroids`` =
    (id, qvec). Returns (id, centroid_id, centroid_cos, kept).

    Shape at scale: one broadcast join for centroid cosines + one
    cluster-keyed self-join — pair work is sum of cluster sizes squared.
    With the house sqrt(n) cell rule that is n^1.5 worst-case; at corpus
    scale size cells to a FIXED occupancy B (centroid count n/B — the
    paper runs ~110k clusters for 5B docs for exactly this reason), which
    makes total pair work n*B, linear; the keep policy is partition-
    agnostic so the knob changes no code here."""
    # norms hoisted: the centroid norm once per centroid (inside the
    # broadcast side, not per assigned row), the member norm once per row
    # (reused by BOTH sides of the cluster self-join, where it was
    # recomputed twice per candidate pair) — identical values; r11
    c = centroids.select(
        F.col(id_col).alias("__cc_id"), F.col(qvec_col).alias("__cv")
    ).withColumn("__ccn", norm2_expr(F.col("__cv")))
    ccos = assigned.withColumn("__n2", norm2_expr(F.col(qvec_col))).join(
        F.broadcast(c), F.col("centroid_id") == F.col("__cc_id")
    ).select(
        F.col(id_col),
        F.col(qvec_col),
        F.col("__n2"),
        F.col("centroid_id"),
        cosine_expr(
            dot_expr(F.col(qvec_col), F.col("__cv")),
            F.col("__n2"),
            F.col("__ccn"),
        ).alias("centroid_cos"),
    )
    a = ccos.select(
        F.col(id_col).alias("__ida"), F.col(qvec_col).alias("__va"),
        F.col("__n2").alias("__na"),
        F.col("centroid_id").alias("__cida"), F.col("centroid_cos").alias("__ca"),
    )
    b = ccos.select(
        F.col(id_col).alias("__idb"), F.col(qvec_col).alias("__vb"),
        F.col("__n2").alias("__nb"),
        F.col("centroid_id").alias("__cidb"), F.col("centroid_cos").alias("__cb"),
    )
    pair_cos = cosine_expr(
        dot_expr(F.col("__va"), F.col("__vb")),
        F.col("__na"),
        F.col("__nb"),
    )
    dropped = (
        a.join(b, (F.col("__cida") == F.col("__cidb")) & (F.col("__ida") != F.col("__idb")))
        .where(pair_cos >= F.lit(threshold))
        .where(
            (F.col("__cb") < F.col("__ca"))
            | ((F.col("__cb") == F.col("__ca")) & (F.col("__idb") < F.col("__ida")))
        )
        .select(F.col("__ida").alias(id_col))
        .distinct()
    )
    return ccos.join(
        dropped.withColumn("__dropped", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "centroid_id",
        "centroid_cos",
        F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
    )


# -- Product quantization (PQ) + asymmetric distance (ADC) -------------------
#
# Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor Search"
# (IEEE TPAMI 2011): split d dims into M subspaces, k-means each subspace
# into a small codebook, store every vector as M small codes, and answer
# queries with ASYMMETRIC distance — the query stays full-precision, each
# corpus vector is scored through a per-query lookup table of
# (subspace, codeword) partial dot products. At 100 TB this is THE
# residency trick for embeddings: d=64 bigint components (512 B) become
# M small codes (the graded config stores 16 — a 32x residency cut), so a
# shard's codes fit executor memory where raw vectors never would, and
# the scan is integer adds over a broadcast LUT.
#
# Everything here is exact integer arithmetic over the fixed-point
# quantized vectors (quantize_expr), with (d2, cid) tiebreaks — the same
# bit-exactness discipline as kmeans_refine, so a DuckDB oracle can replay
# codebook training, encoding, and ADC scoring and hash-match the result.
#
# Spark-first trick: all M subspace k-means problems train in ONE
# relational pass — subvectors are stacked as (id, m, sv) and every
# assignment / centroid update keys by the COMPOSITE (m, cid), so one
# broadcast join + one aggregation per Lloyd iteration trains every
# subspace simultaneously (a per-subspace driver loop would run M jobs
# per iteration for no reason).


def pq_subvectors(
    vectors: DataFrame,
    n_sub: int,
    dim: int,
    id_col: str = "vec_id",
    qvec_col: str = "__v",
) -> DataFrame:
    """Stack a quantized-vector relation into per-subspace rows
    (id, m, sv): one posexplode, no data movement beyond the row split."""
    if dim % n_sub != 0:
        raise ValueError(f"n_sub={n_sub} must divide dim={dim}")
    sub = dim // n_sub
    slices = F.array(
        *[F.slice(F.col(qvec_col), m * sub + 1, sub) for m in range(n_sub)]
    )
    return vectors.select(
        F.col(id_col), F.posexplode(slices).alias("m", "sv")
    )


def _pq_assign(subv: DataFrame, codebooks: DataFrame, id_col: str) -> DataFrame:
    """Nearest codeword per (vector, subspace): broadcast the codebooks
    (M x ksub rows — tiny by construction), exact int L2, (d2, cid)
    tiebreak, windowless min_by per (id, m). Carries sv through for the
    training update step."""
    d2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = subv.join(F.broadcast(codebooks), "m").select(
        id_col, "m", "sv", "cid", d2.alias("__d2")
    )
    best = scored.groupBy(id_col, "m").agg(
        F.min_by(F.struct("cid", "sv"), F.struct("__d2", "cid")).alias("__b")
    )
    return best.select(
        id_col, "m", F.col("__b.sv").alias("sv"), F.col("__b.cid").alias("code")
    )


def pq_train(
    subv: DataFrame,
    seed_mod: int,
    iters: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """Train all M subspace codebooks at once: seeds are the subvectors of
    every ``id % seed_mod == 0`` row (code id = seed vector id, the same
    oracle-replayable convention as the IVF seeds), refined by ``iters``
    Lloyd iterations over the stacked relation. Centroid updates are exact
    integer floor-division means (pmod identity), so training is
    bit-identical across engines. Returns (m, cid, cv).

    Per iteration: one broadcast-assign pass + one (m, cid, d)-keyed
    aggregation — map-side combinable, no driver-side state, and the M
    subspaces share both shuffles."""
    codebooks = (
        subv.where(F.col(id_col) % seed_mod == 0)
        .select("m", F.col(id_col).alias("cid"), F.col("sv").alias("cv"))
        .persist()
    )
    codebooks.count()
    prev = codebooks
    for _ in range(iters):
        assigned = _pq_assign(subv, codebooks, id_col)
        dims = assigned.select(
            "m", F.col("code").alias("cid"),
            F.posexplode(F.col("sv")).alias("__d", "__x"),
        )
        means = (
            dims.groupBy("m", "cid", "__d")
            .agg(F.sum("__x").alias("__s"), F.count("*").alias("__n"))
            .withColumn("__m", F.expr("(__s - pmod(__s, __n)) div __n"))
            .groupBy("m", "cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__d", "__m"))),
                    lambda s: s["__m"].cast("bigint"),
                ).alias("cv")
            )
        )
        kept = codebooks.join(means.select("m", "cid"), ["m", "cid"], "left_anti")
        codebooks = means.unionByName(kept).persist()
        codebooks.count()
        prev.unpersist()
        prev = codebooks
    return codebooks


def pq_encode(
    subv: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Encode the corpus: (codes, recon) where codes = (id, m, code) — the
    compressed representation, M small ints per vector — and recon =
    (id, recon_n2), the squared norm of each vector's RECONSTRUCTION
    (sum of its codewords' squared norms: subspaces are orthogonal by
    construction, so the concatenated codeword norm decomposes exactly).
    recon_n2 is what ADC cosine normalizes by — using the true vector norm
    would mix exact and approximate geometry."""
    assigned = _pq_assign(subv, codebooks, id_col)
    cw_n2 = codebooks.select(
        F.col("m").alias("__cwm"), F.col("cid").alias("__cwc"),
        F.aggregate(
            F.col("cv"), F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
        ).alias("__cwn2"),
    )
    codes = assigned.select(id_col, "m", "code")
    recon = (
        codes.join(
            F.broadcast(cw_n2),
            (F.col("m") == F.col("__cwm")) & (F.col("code") == F.col("__cwc")),
        )
        .groupBy(id_col)
        .agg(F.sum("__cwn2").alias("recon_n2"))
    )
    return codes, recon


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    recon: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    n_sub: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    qvec_col: str = "__v",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: per query build the (m, cid) -> partial
    dot LUT (full-precision query subvector x codeword — |queries| x M x
    ksub rows, broadcastable by construction), then score every corpus
    vector as the sum of its M looked-up partials: one broadcast hash join
    on (m, code) + one (query, id) aggregation. Approximate cosine =
    adc_dot / (|q| * |reconstruction|); ranking ties break by id.

    Cost: O(|corpus| x M) integer adds per query batch against the CODES —
    the raw vectors are never read at query time. For sublinear candidate
    generation compose with the IVF router: pass the probed (query_id,
    id_col) pairs as ``candidates`` and only those pairs are scored —
    IVF-PQ (tests/test_pipeline.py pins the composition); this function is
    the exact-over-codes scorer both paths share."""
    qsub = pq_subvectors(queries, n_sub, dim, id_col, qvec_col).select(
        F.col(id_col).alias("query_id"), "m", F.col("sv").alias("qsv")
    )
    lut = qsub.join(F.broadcast(codebooks), "m").select(
        "query_id", "m", "cid",
        F.aggregate(
            F.zip_with(F.col("qsv"), F.col("cv"), lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("__partial"),
    )
    qn2 = queries.select(
        F.col(id_col).alias("query_id"), norm2_expr(F.col(qvec_col)).alias("__qn2")
    )
    scored = codes.join(
        F.broadcast(lut),
        (codes["m"] == lut["m"]) & (codes["code"] == lut["cid"]),
    ).where(F.col(id_col) != F.col("query_id"))
    if candidates is not None:
        scored = scored.join(
            candidates.select("query_id", id_col), ["query_id", id_col], "semi"
        )
    scored = (
        scored.groupBy("query_id", id_col)
        .agg(F.sum("__partial").alias("__adc"))
        .join(recon, id_col)
        .join(F.broadcast(qn2), "query_id")
        .where((F.col("recon_n2") > 0) & (F.col("__qn2") > 0))
    )
    cos = F.col("__adc").cast("double") / (
        F.sqrt(F.col("__qn2").cast("double")) * F.sqrt(F.col("recon_n2").cast("double"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.col(id_col)
    )
    return (
        scored.select("query_id", id_col, cos.alias("adc_cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "adc_cosine", F.col("rank").cast("bigint").alias("rank"))
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (round 9b): the third compression point on the ANN
# memory/recall curve, between raw vectors (8 bytes/dim here) and PQ codes
# (16 codes/vector). Every dimension is linearly quantized to one byte using
# the corpus's own per-dimension [min, max] — a single aggregation row that
# broadcasts everywhere. Scoring is asymmetric (full-precision query against
# reconstructed corpus values), and the production read path is
# compressed-scan -> top-R candidates -> EXACT rerank of R rows: the final
# ranking is exact cosine over the true (quantized-int) vectors, with the
# SQ8 scan only deciding WHICH R rows get the exact treatment. All integer
# arithmetic (integer-division encode/reconstruct on non-negative operands,
# where Spark's `div` and DuckDB's `//` agree), so the oracle replays
# training + encoding + scoring bit-for-bit.
# ---------------------------------------------------------------------------

SQ8_LEVELS = 255  # codes 0..255: (x - min) * 255 div (max - min)


def sq8_train(
    vectors: DataFrame, id_col: str = "vec_id", qvec_col: str = "__v"
) -> DataFrame:
    """Per-dimension [min, max] over a quantized-int corpus: ONE
    map-side-combinable aggregation (explode dims -> min/max per dim ->
    re-assemble two arrays). Output is a single row (mins, maxs) — the
    entire 'codebook' of scalar quantization, broadcastable by
    construction at any corpus size."""
    dims = vectors.select(F.posexplode(F.col(qvec_col)).alias("__d", "__x"))
    per_dim = dims.groupBy("__d").agg(
        F.min("__x").alias("__mn"), F.max("__x").alias("__mx")
    )
    return per_dim.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__d", "__mn"))), lambda s: s["__mn"]
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("__d", "__mx"))), lambda s: s["__mx"]
        ).alias("maxs"),
    )


def _sq8_code_expr(vec: str, mins: str, maxs: str) -> Column:
    """codes[i] = (x - min) * 255 div (max - min); constant dims encode 0.
    Non-negative operands, so truncating (Spark div) and flooring
    (DuckDB //) integer division agree."""
    return F.expr(
        f"transform(sequence(1, size({vec})), i -> CASE "
        f"WHEN {maxs}[i - 1] > {mins}[i - 1] "
        f"THEN (({vec}[i - 1] - {mins}[i - 1]) * {SQ8_LEVELS}) "
        f"div ({maxs}[i - 1] - {mins}[i - 1]) "
        f"ELSE CAST(0 AS BIGINT) END)"
    )


def _sq8_recon_expr(codes: str, mins: str, maxs: str) -> Column:
    """Reconstructed per-dim value r[i] = min + code * (max - min) div 255
    — same integer-division portability argument as the encoder."""
    return F.expr(
        f"transform(sequence(1, size({codes})), i -> {mins}[i - 1] + "
        f"(({codes}[i - 1]) * ({maxs}[i - 1] - {mins}[i - 1])) div {SQ8_LEVELS})"
    )


def sq8_encode(
    vectors: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    qvec_col: str = "__v",
) -> DataFrame:
    """Encode the corpus to byte codes: one scan, the 1-row bounds
    broadcast-crossed in. Returns (id, codes, recon_n2) where recon_n2 is
    the exact squared norm of the RECONSTRUCTION — what asymmetric cosine
    must normalize by (the pq_encode argument: approximate geometry
    normalizes by approximate norms)."""
    enc = vectors.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col),
        _sq8_code_expr(qvec_col, "mins", "maxs").alias("codes"),
        "mins",
        "maxs",
    )
    recon = _sq8_recon_expr("codes", "mins", "maxs")
    # codes and recon_n2 in the same pass: one broadcast of the 1-row
    # bounds, one projection — not a second crossJoin
    return enc.select(
        id_col,
        "codes",
        F.aggregate(
            recon, F.lit(0).cast("bigint"), lambda acc, r: acc + r * r
        ).alias("recon_n2"),
    )


def _exact_rerank_topk(
    approx_scored: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    rerank_factor: int,
    approx_col: str,
    id_col: str = "vec_id",
    qvec_col: str = "__v",
) -> DataFrame:
    """The shared tail of every compressed-scan ANN path (SQ8, JL): cut the
    approx-scored relation to rerank_factor*k candidates per query
    (rank-then-filter on the RAW row_number -> WindowGroupLimit; a cast in
    between breaks InferWindowGroupLimit's pattern match — the r7
    dsir_importance_topk lesson), join ONLY those survivors back to the
    true vectors, exact-cosine rerank to the final top-k. Deterministic:
    exact-int approx scores with an id tiebreak pick the candidates, so
    the exact output hashes cross-engine."""
    from pyspark.sql import Window

    wa = Window.partitionBy("query_id").orderBy(F.desc(approx_col), F.col(id_col))
    cand = (
        approx_scored.withColumn("__arnk", F.row_number().over(wa))
        .where(F.col("__arnk") <= rerank_factor * k)
        .select("query_id", id_col)
    )
    c = corpus.select(F.col(id_col), F.col(qvec_col).alias("__cv"))
    # query norm hoisted into the broadcast side (once per query, not per
    # surviving pair). The CORPUS norm stays in the pair projection on
    # purpose: each surviving pair is unique, so it already evaluates once
    # there — hoisting it into `c` would compute it for EVERY corpus row
    # while the rerank only touches rerank_factor*k of them per query.
    # The pair stage deliberately stays EXPRESSION-ONLY (r12 measured the
    # Arrow-kernel variant and reverted it): the rerank relation is
    # rank-bounded (rerank_factor*k rows per query), so the interpreted
    # dot work here is bounded and was never hot — and an EvalPython node
    # does not propagate its child's output partitioning, which cost the
    # plan one extra exchange before the final per-query window
    # (plan-budget gate caught it: ann_rp/sq8 shuffles 2 -> 3 with no
    # bench-row win). The vectorized kernel stays where pair volume is
    # unbounded (hard_negative_topk).
    exact = (
        cand.join(c, id_col)
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"), F.col(qvec_col).alias("__qv"),
                    norm2_expr(F.col(qvec_col)).alias("__qn"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            id_col,
            cosine_expr(
                dot_expr(F.col("__qv"), F.col("__cv")),
                F.col("__qn"),
                norm2_expr(F.col("__cv")),
            ).alias("cosine"),
        )
    )
    we = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        exact.withColumn("__rnk", F.row_number().over(we))
        .where(F.col("__rnk") <= k)
        .select(
            "query_id", id_col, "cosine", F.col("__rnk").cast("bigint").alias("rank")
        )
    )


def sq8_topk(
    queries: DataFrame,
    codes: DataFrame,
    bounds: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    qvec_col: str = "__v",
) -> DataFrame:
    """SQ8 ANN with exact rerank: stream the CODES (the raw vectors are not
    read by the scan), score approximate cosine = q . reconstruction /
    (|q| |reconstruction|) per (query, vector), keep the top
    rerank_factor*k per query (rank-then-filter -> WindowGroupLimit:
    per-partition heaps, no global sort), then join ONLY those survivors
    back to the true vectors for exact cosine and the final top-k. The
    candidate set is deterministic (exact-int approx scores, id tiebreak),
    so the exact output hashes cross-engine. Returns
    (query_id, vec_id, cosine, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(qvec_col).alias("__qv"),
        norm2_expr(F.col(qvec_col)).alias("__qn2"),
    )
    scored = (
        codes.crossJoin(F.broadcast(bounds))
        .withColumn("__rv", _sq8_recon_expr("codes", "mins", "maxs"))
        .crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            "__qn2",
            dot_expr(F.col("__qv"), F.col("__rv")).alias("__adot"),
            "recon_n2",
        )
        .where((F.col("recon_n2") > 0) & (F.col("__qn2") > 0))
        .select(
            "query_id",
            id_col,
            (
                F.col("__adot").cast("double")
                / (
                    F.sqrt(F.col("__qn2").cast("double"))
                    * F.sqrt(F.col("recon_n2").cast("double"))
                )
            ).alias("__acos"),
        )
    )
    return _exact_rerank_topk(
        scored, corpus, queries, k, rerank_factor, "__acos", id_col, qvec_col
    )


# ---------------------------------------------------------------------------
# Random-projection ANN (round 9b): Johnson-Lindenstrauss dimensionality
# reduction with the database-friendly ±1 projection (Achlioptas, JCSS 2003)
# — the SAME md5-derived hyperplane family the sign-LSH path uses, kept as
# full integer dots instead of sign bits. Projecting 64 dims down to m
# synthetic dims (the graded config uses m=32: 2x residency; m=16 doubles
# the saving at lower adversarial-corpus recall) keeps pairwise cosine
# approximately (JL), and every
# projected component is an exact int64 (±1 x quantized ints), so the
# DuckDB oracle replays projection, candidate ranking and rerank
# bit-for-bit. Read path mirrors SQ8: projected scan -> top-R candidates
# (WindowGroupLimit) -> exact cosine rerank of R rows in the original space.
# ---------------------------------------------------------------------------


def rp_project(
    vectors: DataFrame,
    planes: list[list[int]],
    id_col: str = "vec_id",
    qvec_col: str = "__v",
) -> DataFrame:
    """Project a quantized-int corpus onto ``planes`` (±1 rows from
    plane_matrix): one map-only scan, output (id, pv) with
    pv[j] = <v, plane_j> exact int64. |pv[j]| <= dim * QUANT ~ 6.4e7 and
    projected dots <= m * (dim * QUANT)^2 (~1.3e17 at the graded m=32) —
    safely inside int64."""
    return vectors.select(
        F.col(id_col), plane_dots_expr(qvec_col, planes).alias("pv")
    )


def rp_topk(
    queries: DataFrame,
    projected: DataFrame,
    corpus: DataFrame,
    planes: list[list[int]],
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    qvec_col: str = "__v",
) -> DataFrame:
    """JL ANN with exact rerank: scan the PROJECTED corpus (m ints/vector),
    rank candidates by projected-space cosine, keep rerank_factor*k per
    query (rank-then-filter -> WindowGroupLimit), join only the survivors
    back to the original vectors for exact cosine top-k. Candidate sets
    are deterministic (exact-int scores, id tiebreak); final cosines are
    the same exact values brute force produces, so recall is the ONLY
    approximation. Returns (query_id, vec_id, cosine, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        plane_dots_expr(qvec_col, planes).alias("__qp"),
    ).select(
        "query_id", "__qp", norm2_expr(F.col("__qp")).alias("__qn2")
    )
    scored = (
        projected.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            dot_expr(F.col("__qp"), F.col("pv")).alias("__pdot"),
            "__qn2",
            norm2_expr(F.col("pv")).alias("__pn2"),
        )
        .where((F.col("__pn2") > 0) & (F.col("__qn2") > 0))
        .select(
            "query_id",
            id_col,
            (
                F.col("__pdot").cast("double")
                / (
                    F.sqrt(F.col("__qn2").cast("double"))
                    * F.sqrt(F.col("__pn2").cast("double"))
                )
            ).alias("__pcos"),
        )
    )
    return _exact_rerank_topk(
        scored, corpus, queries, k, rerank_factor, "__pcos", id_col, qvec_col
    )


def filtered_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """FILTERED vector search: per query, cosine top-k among only the
    candidates satisfying the query's metadata predicate (label equality
    here) — the search+filter composition where post-filtering a vanilla
    ANN result underfills k whenever the predicate is selective, and
    specialized vector stores fall back to brute force. Relationally it is
    simply a different JOIN: the query set broadcasts and candidates hash-
    join on the label (an equi-join, cheaper than brute's crossJoin —
    candidates of non-queried labels are dropped AT THE JOIN, before any
    scoring), then the same rank-then-filter per query plans
    WindowGroupLimit. Selectivity helps instead of hurting: scored pairs
    are |label-matched| rather than |corpus| x |queries|. Returns
    (query_id, vec_id, label, cosine, rank)."""
    from pyspark.sql import Window

    # norms hoisted into the side projections — once per vector, not per
    # label-matched pair (identical values; r11)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("__ql"),
        quantize_expr(vec_col).alias("__qv"),
    ).withColumn("__qn", norm2_expr(F.col("__qv")))
    c = candidates.select(
        F.col(id_col), F.col(label_col), quantize_expr(vec_col).alias("__cv")
    ).withColumn("__cn", norm2_expr(F.col("__cv")))
    scored = (
        F.broadcast(q)
        .join(c, (F.col(label_col) == F.col("__ql")) & (F.col(id_col) != F.col("query_id")))
        .select(
            "query_id",
            id_col,
            label_col,
            cosine_expr(
                dot_expr(F.col("__qv"), F.col("__cv")),
                F.col("__qn"),
                F.col("__cn"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def hard_negative_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    semi_hard: bool = True,
) -> DataFrame:
    """Hard-negative mining for contrastive training (DPR / SimCSE /
    FaceNet): per anchor, the top-k most-cosine-similar vectors of a
    DIFFERENT label — the negatives that actually move a contrastive
    loss, where random negatives are trivially easy. With ``semi_hard``
    (Schroff et al. 2015's band) a negative must also score STRICTLY
    BELOW the anchor's hardest positive (max same-label cosine), dropping
    label-noise rows that would gradient-invert; anchors with no positive
    at all keep every negative (pos_max = +2, above any cosine, so the
    strictly-below gate never fires for them).

    Relationally: anchors broadcast; positives come from a label
    EQUI-join (cheap, match-sized — the filtered_topk shape); negatives
    from the one corpus scan filtered label != anchor's (a broadcast
    nested-loop, the same cost class as brute_force_topk's crossJoin);
    rank-then-filter plans WindowGroupLimit. At 100 TB the negative side
    composes with the clustered/IVF candidate machinery exactly like
    ``filtered_topk`` — score cluster-probed candidates, not the corpus.
    Returns (query_id, vec_id, label, cosine, pos_max, rank)."""
    from pyspark.sql import Window

    # norms hoisted into the side projections — once per vector instead of
    # twice per (anchor, candidate) pair in BOTH the positive equi-join and
    # the negative cross join (identical values; r11)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("__ql"),
        quantize_expr(vec_col).alias("__qv"),
    ).withColumn("__qn", norm2_expr(F.col("__qv")))
    c = candidates.select(
        F.col(id_col), F.col(label_col), quantize_expr(vec_col).alias("__cv")
    ).withColumn("__cn", norm2_expr(F.col("__cv")))
    # the per-pair dot runs through the vectorized Arrow kernel (r12): the
    # anchor x corpus pair volume is the one place the interpreted HOF dot
    # dominated (guide §4.2); values are bit-identical (exact int64 dots,
    # same IEEE double cosine), pinned by the oracle hash gate
    dot = dot_pandas_udf()
    cos = cosine_expr(
        dot(F.col("__qv"), F.col("__cv")),
        F.col("__qn"),
        F.col("__cn"),
    )
    # negative side: the semi-hard filter references the UDF-derived cosine,
    # and the optimizer's filter pushdown would otherwise evaluate the
    # Arrow kernel TWICE per surviving pair (guide §4.4 — two
    # ArrowEvalPython nodes observed in the plan); the nondeterministic
    # mark pins a single evaluation. Values are unchanged — the kernel is
    # pure — only reorder/duplicate freedom is withdrawn.
    dot_once = dot.asNondeterministic()
    cos_once = cosine_expr(
        dot_once(F.col("__qv"), F.col("__cv")),
        F.col("__qn"),
        F.col("__cn"),
    )
    pos = (
        F.broadcast(q)
        .join(
            c,
            (F.col(label_col) == F.col("__ql"))
            & (F.col(id_col) != F.col("query_id")),
        )
        .select("query_id", cos.alias("__pc"))
        .groupBy("query_id")
        .agg(F.max("__pc").alias("pos_max"))
    )
    neg = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col(label_col) != F.col("__ql"))
        .select("query_id", id_col, label_col, cos_once.alias("cosine"))
    )
    scored = neg.join(F.broadcast(pos), "query_id", "left").withColumn(
        "pos_max", F.coalesce(F.col("pos_max"), F.lit(2.0))
    )
    if semi_hard:
        scored = scored.where(F.col("cosine") < F.col("pos_max"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
