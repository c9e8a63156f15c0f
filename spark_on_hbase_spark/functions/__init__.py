"""Scalar function library: byte/hex/UUID codecs, CRC variant, EP edge-property
codec — the engine's cross-language-stable encodings (reference:
misc/ByteUtils.java, examples/graph/EP.scala)."""

from spark_on_hbase_spark.functions.bytesfn import (
    crc16_arc,
    hex_to_bytes,
    bytes_to_hex,
    java_string_hashcode,
    parse_uuid,
    uuid_to_string,
    uuid_to_numeric_string,
    be_int,
    be_long,
    read_be_int,
    read_be_long,
    unsigned_compare,
)
from spark_on_hbase_spark.functions.ep import EP, ep_encode, ep_decode, ep_combine

__all__ = [
    "crc16_arc",
    "hex_to_bytes",
    "bytes_to_hex",
    "java_string_hashcode",
    "parse_uuid",
    "uuid_to_string",
    "uuid_to_numeric_string",
    "be_int",
    "be_long",
    "read_be_int",
    "read_be_long",
    "unsigned_compare",
    "EP",
    "ep_encode",
    "ep_decode",
    "ep_combine",
]
