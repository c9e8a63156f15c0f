"""Hypothesis property tests for the pure-Python kernels: keyspace codec
round-trips/orderings, partitioner bounds, EP codec laws — the reference's
randomized-test style (KeySpaceTest.scala:30-60) broadened to properties."""

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_on_hbase_spark.functions.bytesfn import crc16_arc
from spark_on_hbase_spark.functions.ep import EP, VENDOR_CODES, ep_combine, ep_decode, ep_encode
from spark_on_hbase_spark.keys import (
    RangePartitioner,
    hex_keyspace,
    long_keyspace,
    long_positive_keyspace,
    string_keyspace,
    uuid_keyspace,
)

LONGS = st.integers(min_value=-(2**63), max_value=2**63 - 1)
POS_LONGS = st.integers(min_value=0, max_value=2**62 - 1)


@given(LONGS)
def test_long_keyspace_roundtrip(n):
    ks = long_keyspace("L")
    assert ks.decode(ks.encode(str(n))) == str(n)


@given(POS_LONGS)
def test_long_positive_keyspace_roundtrip(n):
    ks = long_positive_keyspace("P")
    assert ks.decode(ks.encode(str(n))) == str(n)


@given(st.text(min_size=1, max_size=40))
def test_string_keyspace_roundtrip(s):
    ks = string_keyspace("S")
    assert ks.decode(ks.encode(s)) == s


@given(st.binary(min_size=1, max_size=32))
def test_hex_keyspace_roundtrip(b):
    ks = hex_keyspace("H")
    assert ks.decode(ks.encode(b.hex())) == b.hex()


@given(st.uuids())
def test_uuid_keyspace_roundtrip(u):
    ks = uuid_keyspace("U")
    assert ks.decode(ks.encode(str(u))) == str(u)


@given(st.binary(min_size=1, max_size=64), st.integers(min_value=1, max_value=1024))
def test_partitioner_in_bounds(key, n):
    p = RangePartitioner(n)
    assert 0 <= p(key) < n


@given(st.integers(min_value=1, max_value=512))
def test_partitioner_covers_extremes(n):
    p = RangePartitioner(n)
    assert p(b"\x00" * 16) == 0
    assert p(b"\xff" * 16) == n - 1


@given(st.binary(min_size=0, max_size=64))
def test_crc16_fits_java_int(b):
    # bug-compatible with the reference's Java signed-byte CRC
    # (ByteUtils.java:223-237): a Java int, not a uint16 (see bytesfn.py)
    v = crc16_arc(b)
    assert -(2**31) <= v < 2**31
    assert crc16_arc(b) == v  # deterministic


EPS = st.builds(
    EP,
    probability=st.integers(min_value=0, max_value=255).map(lambda k: k / 255.0),
    vendor=st.sampled_from(sorted(VENDOR_CODES)),
    ts=st.integers(min_value=0, max_value=2**40),
)


@given(EPS)
@settings(max_examples=50)
def test_ep_codec_roundtrip(ep):
    packed, ts = ep_encode(ep.probability, ep.vendor, ep.ts)
    back = ep_decode(packed, ts)
    if ep.vendor != "RESERVED":  # RESERVED decodes via the vendor table too
        assert back.vendor == ep.vendor
    assert abs(back.probability - ep.probability) < 1 / 255 + 1e-9
    assert back.ts == ep.ts


@given(EPS, EPS, EPS)
@settings(max_examples=50)
def test_ep_combine_commutative_associative(a, b, c):
    ab, ba = ep_combine(a, b), ep_combine(b, a)
    assert (ab.probability, ab.vendor, ab.ts) == (ba.probability, ba.vendor, ba.ts)
    left = ep_combine(ep_combine(a, b), c)
    right = ep_combine(a, ep_combine(b, c))
    assert (left.probability, left.vendor, left.ts) == (right.probability, right.vendor, right.ts)


@given(EPS)
def test_ep_combine_idempotent(a):
    aa = ep_combine(a, a)
    assert (aa.probability, aa.vendor, aa.ts) == (a.probability, a.vendor, a.ts)


# ---------------------------------------------------------------------------
# multimodal raster codecs (pure Python, no Spark)
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_ppm_roundtrip_and_full_stream_validation(w, h, seed):
    """encode -> parse -> decode is the identity for any image, and a
    truncated stream never parses (the text-payload misparse guard)."""
    import numpy as np

    from spark_on_hbase_spark.operators import multimodal as M

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = M._encode_ppm(img)
    frames = M._ppm_frames(payload)
    assert frames and frames[0][:2] == (w, h)
    assert np.array_equal(M._decode_image(payload), img)
    # multi-frame stream: 2 concatenated frames parse as 2
    assert len(M._ppm_frames(payload + payload)) == 2
    # any strict prefix (cut into the pixel data) must NOT parse
    assert M._ppm_frames(payload[:-1]) == []


@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.tuples(
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=255),
    ),
)
@settings(max_examples=40, deadline=None)
def test_bmp_header_and_decode_roundtrip(w, h, rgb):
    """BMP decode (BGR order, bottom-up rows, 4-byte row padding) agrees
    with the PPM decode of the same solid image."""
    import numpy as np

    from tests.test_pipeline import _make_bmp, _make_ppm
    from spark_on_hbase_spark.operators import multimodal as M

    bmp = M._decode_image(_make_bmp(w, h, rgb))
    ppm = M._decode_image(_make_ppm(w, h, bytes(rgb) * (w * h)))
    assert bmp is not None and np.array_equal(bmp, ppm)


# ---------------------------------------------------------------------------
# PII regex cross-engine parity (text.PII_PATTERNS)
# ---------------------------------------------------------------------------

import re  # noqa: E402

import duckdb  # noqa: E402

from spark_on_hbase_spark.operators.text import PII_PATTERNS  # noqa: E402

# alphabet biased toward the pattern vocabulary so emails/IPs/phones (and
# tricky near-misses) actually occur in generated inputs
_PII_ALPHABET = "ab@.+- 0123456789x"


@settings(max_examples=200)
@given(st.text(alphabet=_PII_ALPHABET, max_size=80))
def test_pii_patterns_python_duckdb_parity(s):
    """The PII patterns are chosen from the Java-regex/RE2 common subset;
    this pins the RE2 (DuckDB oracle) side against Python's engine as an
    independent third implementation — match COUNTS and the full redaction
    output must agree on every generated input. (The Spark/Java side is
    pinned by the graded text_pii_scrub oracle run.)"""
    red_py = s
    for _kind, pat, repl in PII_PATTERNS:
        n_py = len(re.findall(pat, s))
        n_dk = duckdb.execute(
            "SELECT len(regexp_extract_all(?, ?))", [s, pat]
        ).fetchone()[0]
        assert n_py == n_dk, (pat, s)
        red_py = re.sub(pat, repl, red_py)
    red_chain = "?"
    for _kind, pat, repl in PII_PATTERNS:
        red_chain = f"regexp_replace({red_chain}, '{pat}', '{repl}', 'g')"
    red_dk = duckdb.execute(f"SELECT {red_chain}", [s]).fetchone()[0]
    assert red_py == red_dk, s
