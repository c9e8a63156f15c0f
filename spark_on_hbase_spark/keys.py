"""Salted multi-keyspace composite keys + uniform range partitioner.

Reference model (keyspace/Key.scala:6-23, keyspace/KeySpace.scala:36-115,
RegionPartitioner.scala:12-68): a row key is
``[4-byte salt][2-byte keyspace symbol][n-byte id]``. The salt is derived from
the id (hash or prefix) so that *any* id distribution spreads uniformly over a
range-partitioned key space, letting multiple key types share one table while
every partition stays balanced (verified < 2% relative stdev in the
reference's KeySpaceTest.scala:59 and in tests/test_keys.py here).

Python-side: exact byte-compatible codecs for golden-vector parity.
Spark-side: keys are a ``struct<salt: binary, ks: string, id: string>`` column
(or, for SQL-oracle-checkable pipelines, an md5-salted string key built by
``salted_key_expr``), range-partitioned via ``repartitionByRange`` — the
DataFrame equivalent of RegionPartitioner.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

from pyspark.sql import Column
from pyspark.sql import functions as F

from spark_on_hbase_spark.functions.bytesfn import (
    be_int,
    be_long,
    crc16_arc,
    java_string_hashcode,
    parse_uuid,
    read_be_long,
    uuid_to_numeric_string,
    uuid_to_string,
)

# ---------------------------------------------------------------------------
# Python-side keyspace codecs (byte-parity with the reference)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class KeySpace:
    """One id-type living in a shared keyed table.

    ``symbol`` identifies the keyspace; its 2-byte wire code is the low 16
    bits of the Java string hashCode (KeySpace.scala:27). ``encode`` maps a
    logical id string to the full salted key bytes; ``decode`` inverts it.
    """

    symbol: str
    encode_id: Callable[[str], bytes]  # id string -> (salt4, id_bytes)
    decode_id: Callable[[bytes], str]  # id_bytes -> id string

    @property
    def code(self) -> int:
        return java_string_hashcode(self.symbol) & 0xFFFF

    def encode(self, id_str: str) -> bytes:
        salt_and_id = self.encode_id(id_str)
        salt, id_bytes = salt_and_id[:4], salt_and_id[4:]
        return salt + self.code.to_bytes(2, "big") + id_bytes

    def decode(self, key: bytes) -> str:
        return self.decode_id(key[6:])


def _uuid_codec(id_str: str) -> bytes:
    b = parse_uuid(id_str)  # salt = first 4 bytes of the uuid itself
    return b[:4] + b


def _uuid_numeric_codec(id_str: str) -> bytes:
    if len(id_str) != 32:
        raise ValueError(f"numeric uuid must be 32 hex chars: {id_str!r}")
    b = bytes.fromhex(id_str)
    return b[:4] + b


def _demo_codec(id_str: str) -> bytes:
    # DemoKeySpace.scala:13-21 — numeric uuid with leading zeros stripped
    b = bytes.fromhex(("0" * 32 + id_str)[-32:])
    return b[:4] + b


def _string_codec(id_str: str) -> bytes:
    ib = id_str.encode("utf-8")
    return be_int(java_string_hashcode(id_str)) + ib


def _long_codec(id_str: str) -> bytes:
    b = be_long(int(id_str))
    return b[:4] + b


def _long_positive_codec(id_str: str) -> bytes:
    b = be_long(int(id_str) << 1)
    return b[:4] + b


def _hex_codec(id_str: str) -> bytes:
    if len(id_str) % 2 != 0:
        raise ValueError("hex id must have even length")
    ib = bytes.fromhex(id_str)
    return be_int(crc16_arc(ib)) + ib


def uuid_keyspace(symbol: str) -> KeySpace:
    return KeySpace(symbol, _uuid_codec, lambda b: uuid_to_string(b))


def uuid_numeric_keyspace(symbol: str) -> KeySpace:
    return KeySpace(symbol, _uuid_numeric_codec, lambda b: uuid_to_numeric_string(b))


def demo_keyspace(symbol: str) -> KeySpace:
    return KeySpace(symbol, _demo_codec, lambda b: uuid_to_numeric_string(b).lstrip("0"))


def string_keyspace(symbol: str) -> KeySpace:
    return KeySpace(symbol, _string_codec, lambda b: b.decode("utf-8"))


def long_keyspace(symbol: str) -> KeySpace:
    return KeySpace(symbol, _long_codec, lambda b: str(read_be_long(b)))


def long_positive_keyspace(symbol: str) -> KeySpace:
    return KeySpace(
        symbol, _long_positive_codec, lambda b: str((read_be_long(b) & 0xFFFFFFFFFFFFFFFF) >> 1)
    )


def hex_keyspace(symbol: str) -> KeySpace:
    return KeySpace(symbol, _hex_codec, lambda b: b.hex())


class KeySpaceRegistry:
    """symbol/code -> KeySpace lookup (reference KeySpaceRegistry.KSREG)."""

    def __init__(self, *spaces: KeySpace):
        self.by_symbol: Dict[str, KeySpace] = {s.symbol: s for s in spaces}
        self.by_code: Dict[int, KeySpace] = {s.code: s for s in spaces}

    def key(self, symbol: str, id_str: str) -> bytes:
        return self.by_symbol[symbol].encode(id_str)

    def decode(self, key: bytes) -> tuple[str, str]:
        code = int.from_bytes(key[4:6], "big")
        ks = self.by_code[code]
        return ks.symbol, ks.decode(key)


# ---------------------------------------------------------------------------
# Range partitioner (reference RegionPartitioner.scala)
# ---------------------------------------------------------------------------

_KEY_SPACE_MAX = (1 << 128) - 1  # 16-byte key prefix range [00..00, ff..ff]


class RangePartitioner:
    """Uniform split of the 128-bit key-prefix space into N partitions.

    Matches the reference's RegionPartitioner golden behavior
    (RegionPartitionerTest.scala:20-53): partition i covers
    ``[i*step, (i+1)*step)`` with ``step = (2^128 - 1) / N`` (integer div),
    keys compared by their first 16 bytes unsigned.

    On a cluster this is metadata only — the physical equivalent is
    ``df.repartitionByRange(N, "key")`` / bucketed writes; salted keys make
    the ranges uniform so no sampling pass is needed.
    """

    def __init__(self, num_partitions: int):
        if num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        self.num_partitions = num_partitions
        self._step = _KEY_SPACE_MAX // num_partitions

    def __call__(self, key: bytes) -> int:
        prefix = (key[:16] + b"\x00" * 16)[:16]
        v = int.from_bytes(prefix, "big")
        if len(key) < 16 and v > 0:
            # a 16-byte split equal to the zero-padded short key compares
            # *greater* than the key in the reference's prefix comparison
            # (ByteUtils.compare returns 1 when the key is the shorter side),
            # so the boundary key belongs to the partition below.
            v -= 1
        return min(v // self._step, self.num_partitions - 1)


# ---------------------------------------------------------------------------
# Spark-side key expressions (SQL-oracle-portable: md5-based salt)
# ---------------------------------------------------------------------------


def salt_expr(id_col: Column | str, nbytes: int = 4) -> Column:
    """Deterministic salt for a string id: first ``nbytes`` bytes of md5(id)
    as lowercase hex. md5 is computed identically by Spark, DuckDB, Python —
    the engine's cross-system-stable stand-in for the reference's
    hash-prefix salts (KeySpace.scala:36-44)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string")), 1, nbytes * 2)


def salted_key_expr(ks: str, id_col: Column | str) -> Column:
    """Full composite key as a sortable string ``<salt8hex>:<ks>:<id>``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.concat_ws(":", salt_expr(c), F.lit(ks), c.cast("string"))


def key_partition_expr(id_col: Column | str, num_partitions: int) -> Column:
    """Partition id a salted key lands in — the Spark-expression twin of
    RangePartitioner, usable in SQL oracles: the 4-byte md5 salt prefix is
    uniform over [0, 2^32), so ``salt_int * N / 2^32`` is the range partition."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    salt_int = F.conv(salt_expr(c), 16, 10).cast("bigint")
    return F.floor(salt_int * num_partitions / F.lit(4294967296))


def salt_sql(id_sql: str) -> str:
    """DuckDB SQL twin of salt_expr for oracle queries."""
    return f"substring(md5(CAST({id_sql} AS VARCHAR)), 1, 8)"


def key_partition_sql(id_sql: str, num_partitions: int) -> str:
    """DuckDB SQL twin of key_partition_expr."""
    return (
        f"CAST(floor(CAST(from_hex({salt_sql(id_sql)}) AS UINTEGER) * {num_partitions} "
        f"/ 4294967296.0) AS BIGINT)"
    )
