"""Structured Streaming ingest (SURVEY.md §2.8 ST1 — and its idiomatic
superset).

The reference's entire streaming surface is a Kafka topic piped through
netcat into ``ssc.socketTextStream`` as ``DStream[String]``
(misc/KafkaProxy.scala:143-164) — no watermarks, no event-time windows, no
state. Structured Streaming gives all of that for free, so this module
exposes:

- sources: socket (the KafkaProxy twin), file/parquet (replayable), kafka
  (gated — not available in this container's Spark build without packages);
- ``merge_stream_into_table``: the reference's implied use — stream
  mutations into a keyed table via ``foreachBatch`` + KeyedTable.update
  (each micro-batch is one deterministic last-writer-wins merge, so the
  sink is idempotent under micro-batch replay: exactly-once table state);
- event-time tumbling/sliding windows with watermark late-data handling;
- session windows (gap-based), the canonical stateful aggregation.

At 100 TB/day the same topology holds: watermark bounds state, the window
aggregation is partial+final per micro-batch, and the table merge is a
keyed rewrite of only affected partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_on_hbase_spark.table import KeyedTable


def socket_stream(spark: SparkSession, host: str = "localhost", port: int = 9999) -> DataFrame:
    """ST1 — the KafkaProxy→netcat→socketTextStream twin: a stream of lines
    (misc/KafkaProxy.scala:143-164). Structured (value: string) instead of
    DStream[String]."""
    return (
        spark.readStream.format("socket").option("host", host).option("port", port).load()
    )


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """ST1 — the direct Kafka source the reference proxied through netcat
    (KafkaProxy pipes a console consumer into ``nc -lk`` and reads it back
    as socketTextStream, misc/KafkaProxy.scala:143-164 — losing offsets,
    partitioning, and replay). Structured Streaming's native source keeps
    all three: per-partition offsets are checkpointed (exactly-once with the
    idempotent merge sink), and one Spark task consumes each Kafka
    partition. Returns the reference's ``DStream[String]`` shape: (value:
    string) plus the offset metadata columns.

    Requires the spark-sql-kafka connector on the classpath (not bundled
    with a plain pyspark install — pass
    ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>``
    at submit time); raises the underlying missing-data-source error
    otherwise, which tests gate on. The record reshaping is split out as
    ``kafka_project`` so the part of this source that is OUR logic executes
    under test in a real micro-batch even where the connector jar cannot be
    provisioned (no-network container) — only the literal
    ``format("kafka")`` handshake stays jar-gated."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return kafka_project(raw)


# the connector's fixed output schema (Kafka source docs) — what
# kafka_project consumes; tests build a stream of this shape jar-free
KAFKA_RAW_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def kafka_project(raw: DataFrame) -> DataFrame:
    """Reshape the connector's raw (key/value binary + metadata) records to
    the reference's ``DStream[String]`` shape, keeping the offset metadata
    the netcat proxy lost (misc/KafkaProxy.scala:143-164)."""
    return raw.select(
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("ts"),
    )


def file_stream(spark: SparkSession, path: str, schema, fmt: str = "parquet") -> DataFrame:
    """Replayable file-based stream — the testable ingest source; also the
    shape of a warehouse-landing-zone tail at scale (new files appear, each
    read exactly once)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def _applied_batch_guard(table: KeyedTable, body):
    """Shared foreachBatch replay guard: skip batch ids already marked
    under <table>/_applied_batches, apply ``body`` otherwise, mark AFTER
    applying (at-least-once marking; the crash window between the two
    replays the batch — see the factories below for what each sink's
    semantics make of that)."""
    import os

    marker_dir = os.path.join(table.path, "_applied_batches")

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, str(batch_id))
        if os.path.exists(marker):
            return
        if not batch_df.isEmpty():
            body(batch_df)
        os.makedirs(marker_dir, exist_ok=True)
        open(marker, "w").close()

    return apply


def idempotent_upsert(table: KeyedTable):
    """The foreachBatch body for ``merge_stream_into_table``, exposed for
    direct testing: applies a micro-batch as one last-writer-wins keyed
    merge, guarded by an applied-batch marker under the table directory so
    a REPLAYED batch id is a strict no-op. The last-writer-wins fold is
    already semantically idempotent (replaying identical rows converges to
    the same values), so the marker is storage hygiene for update — it
    stops replays appending duplicate delta layers — but it is the
    CORRECTNESS gate any non-idempotent sink variant (e.g. a streaming
    counter built on KeyedTable.increment, which double-counts on replay)
    must reuse. Marker write happens AFTER the merge: a crash between the
    two replays the batch, which the idempotent merge absorbs —
    at-least-once marking, exactly-once table effect."""
    return _applied_batch_guard(table, table.update)


def guarded_increment(table: KeyedTable, counter_col: str, delta_col: str = "delta"):
    """The foreachBatch body for ``increment_stream_into_table``, exposed
    for direct testing (cf. ``idempotent_upsert``): applies a micro-batch
    of additive deltas guarded by the applied-batch marker — for a
    NON-idempotent increment the marker is the exactly-once gate."""
    return _applied_batch_guard(
        table, lambda b: table.increment(b, counter_col, delta_col=delta_col)
    )


def increment_stream_into_table(
    stream: DataFrame,
    table: KeyedTable,
    checkpoint_dir: str,
    counter_col: str,
    delta_col: str = "delta",
    available_now: bool = False,
):
    """Stream additive counter deltas into a KeyedTable (the streaming face
    of S7, HBaseTable.increment): every micro-batch pre-aggregates per key
    and appends ONE additive delta layer. Unlike the last-writer-wins
    merge, increment is NOT idempotent — a replayed micro-batch would
    double-count — so here the applied-batch marker is the CORRECTNESS
    gate, not storage hygiene. Marker ordering is the same
    at-least-once-marking scheme as ``idempotent_upsert``; the crash
    window between increment and marker is the documented residual (a
    transactional sink would need a commit log the storage layer doesn't
    model), and it only reopens on a failure at exactly that point —
    normal replays (restart, retrigger, speculative re-run of a committed
    batch) are fully absorbed.

    Returns the StreamingQuery (caller awaits/stops)."""
    writer = stream.writeStream.foreachBatch(
        guarded_increment(table, counter_col, delta_col)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_stream_into_table(
    stream: DataFrame, table: KeyedTable, checkpoint_dir: str, available_now: bool = False
):
    """Stream mutations into a KeyedTable: every micro-batch applies one
    last-writer-wins keyed merge (KeyedTable.update) through the
    ``idempotent_upsert`` guard, so a micro-batch replayed after failure
    neither changes table state nor appends a duplicate delta layer.

    Returns the StreamingQuery (caller awaits/stops)."""
    writer = stream.writeStream.foreachBatch(idempotent_upsert(table)).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 day",
    slide: str | None = None,
    watermark: str = "1 day",
    group_cols: tuple = ("event_type",),
) -> DataFrame:
    """Event-time tumbling (or sliding) window counts+sums with a watermark:
    late rows beyond the watermark are dropped, bounding state — what the
    reference's DStream could never express."""
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *group_cols)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def stateful_running_stats(
    stream: DataFrame,
    key_col: str = "key",
    value_col: str = "v",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running (count, sum, max) maintained across micro-batches, one updated
    row emitted per key per batch.

    This is the engine's escape hatch for stateful logic Structured
    Streaming's built-ins can't express (the reference's incremental BSP
    state, HGraphTable.scala:144-228, is the motivating shape): state lives
    in the state store (checkpointed, partitioned by key — scales with
    distinct keys, not events), and the per-batch kernel is Arrow-batched
    pandas."""
    import pandas as pd  # local: keep module import light

    out_schema = (
        f"{key_col} string, n_events bigint, total double, max_value double"
    )
    state_schema = "n bigint, s double, m double"

    def update_fn(key, pdf_iter, state):
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf[value_col].sum())
            m = max(m, float(pdf[value_col].max()))
        state.update((n, s, m))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total": [s], "max_value": [m]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update_fn, out_schema, state_schema, "update", "NoTimeout"
    )


def sessionized_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 day",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based) per user — the canonical stateful
    streaming aggregation; state per open session, closed by the watermark."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), user_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    delay: str = "10 minutes",
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming exact deduplication: first-seen row per key wins, across
    micro-batches — the streaming twin of the batch ``dedup.exact_dup_groups``
    path and the front door of a training-data ingest pipeline (dedup by
    content fingerprint as documents land).

    Built on Structured Streaming's ``dropDuplicates`` state store: seen keys
    live in checkpointed state partitioned by key, so memory scales with
    distinct keys, not events. Give ``ts_col`` (event time) to bound that
    state with a watermark — without one, an unbounded key universe grows
    state forever, the classic 100 TB/day failure. ``within_watermark=True``
    uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+): duplicates are only
    suppressed while inside the watermark window, which is the right
    semantic when upstream retries land seconds apart and the key space is
    unbounded (state is evicted at the watermark instead of kept forever)."""
    if ts_col is not None:
        stream = stream.withWatermark(ts_col, delay)
        if within_watermark:
            return stream.dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)


def stream_enrich(stream: DataFrame, dim: DataFrame, on: str | list, how: str = "left") -> DataFrame:
    """Stream-static enrichment join: every micro-batch of the stream joins
    against the CURRENT state of a batch dimension relation — the standard
    "attach user/document metadata as events land" step. The static side is
    broadcast (dimension-sized, re-planned per micro-batch, so a
    slowly-changing dimension's updates are picked up between batches
    without restarting the query); the stream side never shuffles. No
    watermark needed: stream-static joins are stateless."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — the attribution workhorse
    (e.g. each purchase joined to the same user's clicks from the preceding
    ``within`` interval). A join class entirely beyond the reference's
    DStream proxy, and the one where Structured Streaming's state-cleanup
    contract matters most: BOTH sides buffer in the state store, and only
    the conjunction of (a) a watermark on each side and (b) a time-range
    predicate tying the two event times lets Spark prove when a buffered
    row can never match again and evict it. Omit either and state grows
    without bound — the canonical 100 TB/day streaming failure. The range
    predicate here is ``right_ts in [left_ts - within, left_ts]``; state
    per side is bounded by (watermark + within) of history, partitioned by
    the join key. ``how`` may be 'inner' or the outer variants Spark
    supports for stream-stream joins ('leftOuter'/'rightOuter'/'fullOuter'
    — outer rows emit only once the watermark closes their match window)."""
    lt, rt, rk = f"__l_{left_ts}", f"__r_{right_ts}", f"__r_{on}"
    l = left.withColumnRenamed(left_ts, lt).withWatermark(lt, watermark)
    # de-collide EVERY shared payload column, not just the event time —
    # e.g. both streams carrying 'value' would otherwise emit two
    # identically-named output columns and break downstream by-name access
    shared = (set(left.columns) & set(right.columns)) - {on, left_ts, right_ts}
    renames = {c: f"{c}_right" for c in sorted(shared)}
    taken = (set(left.columns) | set(right.columns)) - shared
    bad = sorted(set(renames.values()) & taken)
    if bad:
        raise ValueError(
            f"cannot de-collide shared columns: suffixed names {bad} already exist"
        )
    r = (
        right.withColumnRenamed(right_ts, rt)
        .withColumnRenamed(on, rk)
        .withColumnsRenamed(renames)
        .withWatermark(rt, watermark)
    )
    cond = (
        (F.col(on) == F.col(rk))
        & (F.col(rt) >= F.col(lt) - F.expr(f"INTERVAL {within}"))
        & (F.col(rt) <= F.col(lt))
    )
    # outer variants: surface ONE key column regardless of which side
    # matched. When both sides use the same event-time name, the right
    # side's keeps a _right suffix — renaming both back would produce two
    # identically-named columns and break every downstream by-name access.
    right_ts_out = right_ts if right_ts != left_ts else f"{right_ts}_right"
    out = (
        l.join(r, cond, how)
        .withColumn(on, F.coalesce(F.col(on), F.col(rk)))
        .drop(rk)
        .withColumnsRenamed({lt: left_ts, rt: right_ts_out})
    )
    # catch-all for the exotic cross-named cases the rename map can't see
    # (e.g. a right payload column named exactly like the LEFT's event
    # time): fail at plan time, never emit duplicate output names
    if len(out.columns) != len(set(out.columns)):
        dupes = sorted({c for c in out.columns if out.columns.count(c) > 1})
        raise ValueError(f"stream-stream join output has duplicate columns: {dupes}")
    return out
