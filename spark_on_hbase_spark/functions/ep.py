"""EP — edge properties codec (reference examples/graph/EP.scala:12-79).

An edge carries (version, probability, vendorCode) packed into 4 bytes plus a
timestamp. Probability is quantized to 1/255 steps (1 byte); vendor is a short
code with an UNKNOWN fallback on decode; ``combine`` (the dedup UDAF,
EP.scala:14) takes the byte-wise max of the packed bytes — which, with a fixed
version byte, means max probability then max vendor code — and the max ts.

Spark-side, edges are plain columns ``(prob double, vendor string, ts)`` with
prob pre-quantized via ``quantize_prob_expr``; combine is
``max(struct(prob, vendor_code))`` + ``max(ts)`` (see operators/graph.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

CURRENT_VERSION = 1
VENDOR_CODE_UNKNOWN = 0

VENDORS = {
    VENDOR_CODE_UNKNOWN: "UNKNOWN",
    128: "P1",
    129: "P2",
    250: "DT1",
    251: "test1",
    252: "test2",
    253: "test3",
    254: "test4",
    32767: "RESERVED",
}
VENDOR_CODES = {name: code for code, name in VENDORS.items()}


@dataclass(frozen=True)
class EP:
    probability: float
    vendor: str
    ts: int

    @property
    def vendor_code(self) -> int:
        return VENDOR_CODES[self.vendor]


def ep_encode(probability: float, vendor: str, ts: int) -> tuple[bytes, int]:
    """(prob, vendor, ts) -> (4 packed bytes, ts). EP.scala:51-58."""
    if not 0.0 <= probability <= 1.0:
        raise ValueError("probability must be within [0, 1]")
    if vendor not in VENDOR_CODES:
        raise ValueError(f"unknown vendor {vendor!r}")
    code = VENDOR_CODES[vendor]
    packed = bytes([CURRENT_VERSION, int(probability * 255.0) & 0xFF, (code >> 8) & 0xFF, code & 0xFF])
    return packed, ts


def ep_decode(packed: bytes, ts: int) -> EP:
    """Packed bytes -> EP, with the reference's unknown-version/vendor
    fallbacks (EP.scala:66-79)."""
    if len(packed) != 4 or packed[0] != CURRENT_VERSION:
        return EP(1.0, "UNKNOWN", ts)
    code = (packed[2] << 8) | packed[3]
    prob = packed[1] / 255.0
    if code not in VENDORS:
        return EP(prob, "UNKNOWN", ts)
    return EP(prob, VENDORS[code], ts)


def ep_combine(a: EP, b: EP) -> EP:
    """Associative dedup merge: byte-max of packed bytes (= max prob, vendor
    code as tiebreak) and max ts (EP.scala:14)."""
    pa, pb = ep_encode(a.probability, a.vendor, a.ts)[0], ep_encode(b.probability, b.vendor, b.ts)[0]
    winner = a if pa >= pb else b
    return EP(winner.probability, winner.vendor, max(a.ts, b.ts))


def quantize_prob_expr(prob: Column | str) -> Column:
    """Quantize a probability to the EP wire precision (1/255 steps,
    truncating like Java's ``(probability * 255.0).toByte``)."""
    c = F.col(prob) if isinstance(prob, str) else prob
    return F.floor(c * 255.0) / F.lit(255.0)
