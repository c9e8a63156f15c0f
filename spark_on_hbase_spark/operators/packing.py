"""Training-sequence assembly: pack documents into fixed-token-budget
training sequences (the step between a curated corpus and a dataloader).

Beyond the reference's surface (it stops at key-value storage semantics);
part of the 100 TB LLM-pipeline layer alongside dedup/similarity/text. The
implemented scheme is concatenate-and-chunk (the standard GPT-style
pre-training packing): documents are deterministically shuffled, virtually
concatenated, and the token stream is sliced into ``budget``-token
sequences. A document is assigned to the sequence its FIRST token lands in;
``seq_offset`` records where inside that sequence it starts, so a loader can
reconstruct exact slice positions without re-deriving the order.

Scale shape: the global concatenation order is sharded by a hash of the
document id — each shard packs independently under a per-shard window (one
shuffle on the shard key, per-partition sort, no global window), and shard
boundaries are also sequence boundaries. ``num_shards`` scales with the
corpus (pick it so one shard's documents fit an executor's sort buffer);
packing quality is unaffected because every shard produces full sequences
except its last. Determinism: the shuffle key is md5(id) — identical in
Spark/DuckDB/Python, stable under task retries and repartitioning — so the
same corpus always packs identically (resumable training runs depend on
exactly this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    num_shards: int = 16,
) -> DataFrame:
    """Assign every document a (shard, seq_id, seq_offset) placement in the
    packed token stream. ``token_col`` is the document's token count (from
    ``text.token_counts`` or a real tokenizer); ``budget`` the sequence
    length. Returns the input columns plus ``shard``, ``seq_id`` (0-based
    within shard) and ``seq_offset`` (the document's first-token position
    within its sequence). Documents longer than the remaining room straddle
    into the next sequence(s) — the loader splits them, as
    concatenate-and-chunk prescribes; ``seq_tokens`` aggregated per sequence
    therefore counts the tokens of documents STARTING there."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if num_shards <= 0:
        # % 0 would silently yield NULL shards (one global NULL window —
        # exactly the shape this operator exists to avoid); fail fast instead
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    clash = {"shard", "seq_id", "seq_offset", "__okey", "__cum"} & set(df.columns)
    if clash:
        # select("*", shard, okey) would duplicate these and the shard window
        # would fail with (or worse, silently resolve) an ambiguous reference
        raise ValueError(
            f"input columns collide with packing output/internal names: {sorted(clash)}"
        )
    # shard from md5 hex chars 9-16 — hash-uniform under ANY id pattern
    # (a plain id % num_shards skews when ids stride, e.g. all-even after an
    # upstream filter), and a DIFFERENT hex range than the order key below
    # so shard and within-shard order stay independent
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 9, 8), 16, 10)
        .cast("bigint") % F.lit(num_shards)
    ).alias("shard")
    okey = F.md5(F.col(id_col).cast("string")).alias("__okey")
    base = df.select("*", shard, okey)
    w = (
        Window.partitionBy("shard")
        .orderBy("__okey", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        base.withColumn("__cum", cum)
        .select(
            *df.columns,
            "shard",
            F.floor(F.col("__cum") / F.lit(budget)).cast("bigint").alias("seq_id"),
            (F.col("__cum") % F.lit(budget)).cast("bigint").alias("seq_offset"),
        )
    )


def packing_census(packed: DataFrame, token_col: str, id_col: str = "doc_id") -> DataFrame:
    """Per-sequence summary of a ``pack_sequences`` assignment: how many
    documents start in each sequence, their total tokens, and the id range —
    the manifest a dataloader shards on. One hash aggregation keyed
    (shard, seq_id); the shuffle reuses the packing's shard partitioning."""
    return packed.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).alias("seq_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )
