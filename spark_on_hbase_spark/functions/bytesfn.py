"""Pure-Python byte-level scalar functions, behavior-compatible with the
reference's misc/ByteUtils.java (299 LoC of big-endian codecs the whole key
model rests on — SURVEY.md §2.7).

These run driver-side when building key literals / golden tests; the hot path
on executors uses Spark built-in expressions instead (hex/unhex/conv etc.).
All integer math reproduces Java 32/64-bit two's-complement semantics.
"""

from __future__ import annotations

_INT_MASK = 0xFFFFFFFF
_LONG_MASK = 0xFFFFFFFFFFFFFFFF


def _to_i32(v: int) -> int:
    v &= _INT_MASK
    return v - (1 << 32) if v >= (1 << 31) else v


def _to_i64(v: int) -> int:
    v &= _LONG_MASK
    return v - (1 << 64) if v >= (1 << 63) else v


def java_string_hashcode(s: str) -> int:
    """Java ``String.hashCode`` (s[0]*31^(n-1)+...), 32-bit wrap-around.

    Keyspace symbols map to their 2-byte code via this (reference
    keyspace/KeySpace.scala:27 ``keySpace.hashCode.toShort``), and the string
    keyspace salts with the full id hashCode (KeySpace.scala:76).
    """
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) & _INT_MASK
    return _to_i32(h)


def crc16_arc(data: bytes) -> int:
    """CRC-16/MODBUS variant used for hex-keyspace salts.

    Reference misc/ByteUtils.java:223-237 names it ``crc32`` but implements a
    16-bit CRC (poly 0xA001 reflected, init 0xFFFF — the MODBUS parameters)
    over *sign-extended* bytes: Java ``(int) array[pos]`` perturbs the high
    bits for bytes >= 0x80, so this is deliberately bug-compatible with the
    reference rather than with the standard.
    """
    crc = 0xFFFF
    for b in data:
        signed = b - 256 if b >= 128 else b
        # Python ints xor/shift in infinite two's complement, which matches
        # Java's signed int semantics here (>> is arithmetic in both).
        crc ^= signed
        for _ in range(8):
            if crc & 1:
                crc = (crc >> 1) ^ 0xA001
            else:
                crc >>= 1
    return _to_i32(crc)


def hex_to_bytes(s: str) -> bytes:
    """Hex string -> bytes (ByteUtils.parseRadix16, java:61-74)."""
    return bytes.fromhex(s)


def bytes_to_hex(b: bytes) -> str:
    """Bytes -> lowercase hex (ByteUtils.toRadix16, java:76-85)."""
    return b.hex()


def parse_uuid(uuid: str) -> bytes:
    """Dashed or numeric (32-hex) UUID string -> 16 bytes big-endian
    (ByteUtils.parseUUID, java:246-276)."""
    return bytes.fromhex(uuid.replace("-", ""))


def uuid_to_string(b: bytes, offset: int = 0) -> str:
    """16 bytes -> dashed lowercase UUID (ByteUtils.UUIDToString, java:278-283)."""
    h = b[offset : offset + 16].hex()
    return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def uuid_to_numeric_string(b: bytes, offset: int = 0) -> str:
    """16 bytes -> 32-char hex UUID without dashes (java:285-287)."""
    return b[offset : offset + 16].hex()


def be_int(v: int) -> bytes:
    """int -> 4 bytes big-endian two's complement (ByteUtils.putIntValue)."""
    return (v & _INT_MASK).to_bytes(4, "big")


def be_long(v: int) -> bytes:
    """long -> 8 bytes big-endian two's complement (ByteUtils.putLongValue)."""
    return (v & _LONG_MASK).to_bytes(8, "big")


def read_be_int(b: bytes, offset: int = 0) -> int:
    """4 bytes big-endian -> signed int (ByteUtils.asIntValue)."""
    return _to_i32(int.from_bytes(b[offset : offset + 4], "big"))


def read_be_long(b: bytes, offset: int = 0) -> int:
    """8 bytes big-endian -> signed long (ByteUtils.asLongValue)."""
    return _to_i64(int.from_bytes(b[offset : offset + 8], "big"))


def unsigned_compare(a: bytes, b: bytes) -> int:
    """Unsigned lexicographic byte comparison; shorter prefix sorts first
    (ByteUtils.compare, java:168-186). Python bytes compare already does this."""
    return -1 if a < b else (1 if a > b else 0)


def xor_checksum(data: bytes) -> int:
    """XOR fold of all bytes (ByteUtils.sum, java:239-244 — named sum, is xor)."""
    s = 0
    for b in data:
        s ^= b
    return s
