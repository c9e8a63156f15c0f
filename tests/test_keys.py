"""Golden-vector parity for the key model, ported from the reference's
KeyTest.scala:16-59 and RegionPartitionerTest.scala:15-86."""

import random
import statistics
import uuid

import pytest

from spark_on_hbase_spark.functions.bytesfn import (
    crc16_arc,
    java_string_hashcode,
    parse_uuid,
    read_be_int,
    uuid_to_string,
)
from spark_on_hbase_spark.keys import (
    KeySpaceRegistry,
    RangePartitioner,
    demo_keyspace,
    hex_keyspace,
    long_keyspace,
    long_positive_keyspace,
    string_keyspace,
    uuid_keyspace,
    uuid_numeric_keyspace,
)


def signed(b: bytes) -> list[int]:
    return [x - 256 if x >= 128 else x for x in b]


REG = KeySpaceRegistry(
    string_keyspace("d"),
    long_keyspace("r"),
    uuid_keyspace("x"),
    uuid_keyspace("v"),
    uuid_keyspace("test"),
    long_positive_keyspace("lp"),
    hex_keyspace("h"),
    uuid_numeric_keyspace("n"),
    demo_keyspace("dd"),
)


def test_golden_string_keys():
    # KeyTest.scala:21-27
    d0 = REG.key("d", "CESE1111")
    assert signed(d0) == [3, -126, 76, 116, 0, 100, 67, 69, 83, 69, 49, 49, 49, 49]
    d1 = REG.key("d", "CESE9999")
    assert signed(d1) == [3, -122, 14, 116, 0, 100, 67, 69, 83, 69, 57, 57, 57, 57]
    assert REG.decode(d0) == ("d", "CESE1111")


def test_golden_uuid_key():
    # KeyTest.scala:29-33
    v0 = REG.key("v", "f81d4fae-7dec-11d0-a765-00a0c91e6bf6")
    assert signed(v0) == [
        -8, 29, 79, -82, 0, 118,
        -8, 29, 79, -82, 125, -20, 17, -48, -89, 101, 0, -96, -55, 30, 107, -10,
    ]
    assert REG.decode(v0) == ("v", "f81d4fae-7dec-11d0-a765-00a0c91e6bf6")


def test_key_ordering():
    # KeyTest.scala:16-19 — Key("d","2") sorts after Key("r","1"):
    # byte-wise unsigned comparison of the full salted keys.
    d = REG.key("d", "2")
    r = REG.key("r", "1")
    assert sorted([d, r]) == [r, d]
    v1 = REG.key("v", "f81d4fae-7dec-11d0-a765-00a0c91e6bf6")
    v2 = REG.key("v", "f81d4fae-7dec-11d0-a765-00a0c91e6bf7")
    x3 = REG.key("x", "f81d4fae-7dec-11d0-a765-00a0c91e6bf8")
    assert v1 < v2 < x3


def test_round_trips():
    for ks, ids in [
        ("r", ["0", "1", "42", "-7", "9223372036854775807"]),
        ("lp", ["0", "1", "4611686018427387903"]),
        ("h", ["00ff10", "deadbeef"]),
        ("n", ["f81d4fae7dec11d0a76500a0c91e6bf6"]),
        ("dd", ["1d4fae7dec11d0a76500a0c91e6bf6"]),
        ("d", ["hello world", ""]),
    ]:
        for i in ids:
            assert REG.decode(REG.key(ks, i)) == (ks, i), (ks, i)


def test_partitioner_uuid_goldens():
    # RegionPartitionerTest.scala:20-30 — 5 partitions over raw 16-byte uuids
    p = RangePartitioner(5)
    cases = [
        ("00000000-0000-0000-0000-000000000000", 0),
        ("33333333-3333-3333-3333-333333333332", 0),
        ("33333333-3333-3333-3333-333333333333", 1),
        ("66666666-6666-6666-6666-666666666665", 1),
        ("66666666-6666-6666-6666-666666666666", 2),
        ("99999999-9999-9999-9999-999999999998", 2),
        ("99999999-9999-9999-9999-999999999999", 3),
        ("cccccccc-cccc-cccc-cccc-cccccccccccb", 3),
        ("cccccccc-cccc-cccc-cccc-cccccccccccc", 4),
        ("ffffffff-ffff-ffff-ffff-fffffffffffe", 4),
        ("ffffffff-ffff-ffff-ffff-ffffffffffff", 4),
    ]
    for u, expected in cases:
        assert p(parse_uuid(u)) == expected, u


def test_partitioner_key_goldens():
    # RegionPartitionerTest.scala:48-53 — 512 partitions over salted keys
    p = RangePartitioner(512)
    assert p(REG.key("test", "f81d4fae-7dec-11d0-a765-00a0c91e6bf6")) == 496
    assert p(REG.key("d", "CASEAS000000000")) == 411
    assert p(REG.key("d", "CASEASfffffffff")) == 267


def test_partitioner_uniformity():
    # KeySpaceTest.scala:49-60 — relative stdev < 2% over 32 partitions.
    rng = random.Random(42)
    p = RangePartitioner(32)
    counts = [0] * 32
    n = 200_000
    for _ in range(n):
        kind = rng.randrange(3)
        if kind == 0:
            # full-range signed long, as in the reference (random.nextLong)
            k = REG.key("r", str(rng.getrandbits(64) - (1 << 63)))
        elif kind == 1:
            # abs(nextLong): 63-bit positive; the <<1 in the codec fills 64 bits
            k = REG.key("lp", str(rng.getrandbits(63)))
        else:
            k = REG.key("test", str(uuid.UUID(int=rng.getrandbits(128))))
        counts[p(k)] += 1
    mean = n / 32
    rel_stdev = statistics.pstdev(counts) / mean
    assert rel_stdev < 0.02, f"relative stdev {rel_stdev:.4f} >= 2%"


def test_java_hashcode():
    assert java_string_hashcode("d") == 100
    assert java_string_hashcode("") == 0
    assert java_string_hashcode("CESE1111") == read_be_int(bytes([3, 130, 76, 116]))


def test_crc16_golden():
    # CRC-16/MODBUS check value for "123456789" (init 0xFFFF, poly 0xA001);
    # the reference's variant only deviates for bytes >= 0x80 (sign extension).
    assert crc16_arc(b"123456789") == 0x4B37


def test_uuid_roundtrip():
    u = "f81d4fae-7dec-11d0-a765-00a0c91e6bf6"
    assert uuid_to_string(parse_uuid(u)) == u
