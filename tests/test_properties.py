"""Property-based tests (hypothesis) for the pure type-system core —
the reference's table-driven unit layer (pgtype_test.go,
conversion_test.go) generalized to generated inputs.

These are session-free (pure Python), so hundreds of examples run in
milliseconds.  The LSN column expressions get one batched Spark pass
over generated examples instead of a session per example.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from creek_spark.types.fingerprint import (
    avro_fingerprint,
    canonical_schema_json,
    crc64_avro,
    fingerprint_schema,
)
from creek_spark.types.pgtypes import (
    DEFAULT_NUMERIC,
    SUPPORTED_PG_TYPES,
    decode_numeric_typmod,
    encode_numeric_typmod,
    pg_type_to_spark,
)


@given(
    precision=st.integers(min_value=1, max_value=38),
    scale=st.integers(min_value=0, max_value=38),
)
def test_numeric_typmod_roundtrip(precision, scale):
    scale = min(scale, precision)  # pg requires scale <= precision
    typmod = encode_numeric_typmod(precision, scale)
    assert decode_numeric_typmod(typmod) == (precision, scale)


@given(typmod=st.integers(max_value=3))
def test_typmod_less_numeric_gets_documented_default(typmod):
    # any typmod < VARHDRSZ (incl. pg's -1 "no typmod") → documented default
    assert decode_numeric_typmod(typmod) == DEFAULT_NUMERIC


@given(pg_type=st.sampled_from(SUPPORTED_PG_TYPES))
def test_every_supported_scalar_maps(pg_type):
    t = pg_type_to_spark(pg_type)
    assert isinstance(t, T.DataType)
    arr = pg_type_to_spark(f"_{pg_type}")
    assert isinstance(arr, T.ArrayType)
    assert arr.elementType == t


@given(name=st.text(min_size=1, max_size=20).filter(lambda s: not s.startswith("_")))
def test_unknown_type_falls_back_to_text(name):
    # mirror of pgtype-avro/pgtype.go:90-96: unknown OIDs → text/string
    if name.lower() in SUPPORTED_PG_TYPES:
        return
    assert pg_type_to_spark(name) == T.StringType()


@given(data=st.binary(max_size=256))
def test_crc64_deterministic_and_width(data):
    a, b = crc64_avro(data), crc64_avro(data)
    assert a == b
    assert 0 <= a < 2**64
    fp = avro_fingerprint(data)
    assert len(fp) == 11  # 8 bytes base64url, no padding


@given(data1=st.binary(max_size=64), data2=st.binary(max_size=64))
def test_crc64_discriminates(data1, data2):
    if data1 != data2:
        # not a collision proof — just catches degenerate implementations
        # (constant output, prefix-only hashing) on random pairs
        if crc64_avro(data1) == crc64_avro(data2):
            assert len(data1) != len(data2) or data1 == data2


_field_names = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6),
    min_size=1,
    max_size=5,
    unique=True,
)


@settings(max_examples=50)
@given(names=_field_names, nullable=st.booleans())
def test_fingerprint_is_schema_function(names, nullable):
    schema = T.StructType(
        [T.StructField(n, T.StringType(), nullable) for n in names]
    )
    again = T.StructType(
        [T.StructField(n, T.StringType(), nullable) for n in names]
    )
    assert fingerprint_schema(schema) == fingerprint_schema(again)
    assert canonical_schema_json(schema) == canonical_schema_json(again)


@settings(max_examples=50)
@given(names=_field_names)
def test_fingerprint_sensitive_to_field_order_and_type(names):
    schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
    retyped = T.StructType([T.StructField(n, T.LongType()) for n in names])
    assert fingerprint_schema(schema) != fingerprint_schema(retyped)
    if len(names) > 1:
        reordered = T.StructType(
            [T.StructField(n, T.StringType()) for n in reversed(names)]
        )
        # a DDL change producing a different column order is a different
        # relation generation → different fingerprint (schemas.go:96-112)
        assert fingerprint_schema(schema) != fingerprint_schema(reordered)


def test_lsn_roundtrip_batched(spark):
    """lsn_str(lsn_num(s)) == canonical form; numeric order == (hi, lo)
    order — checked over a generated batch in one Spark pass."""
    import random

    from pyspark.sql import functions as F

    from creek_spark.functions.lsn import lsn_num, lsn_str

    rng = random.Random(42)
    # hi capped at 2^31-1: lsn_num is a signed LongType, which holds any
    # LSN below ~2^63 bytes ≈ 8 EB of WAL — far beyond any deployment
    # (hi = upper 32 bits; hi ≥ 2^31 alone implies > 2 EB)
    cases = [(rng.randrange(2**31), rng.randrange(2**32)) for _ in range(300)]
    cases += [(0, 0), (0, 1), (1, 0), (2**31 - 1, 2**32 - 1)]
    df = spark.createDataFrame(
        [(f"{hi:X}/{lo:X}", (hi << 32) + lo) for hi, lo in cases],
        "lsn string, expect long",
    )
    out = df.select(
        "lsn",
        "expect",
        lsn_num(F.col("lsn")).alias("num"),
        lsn_str(lsn_num(F.col("lsn"))).alias("rt"),
    ).collect()
    for r in out:
        assert r["num"] == r["expect"], r
        assert r["rt"] == r["lsn"], r


# ---------------------------------------------------------------------------
# Media header builders ↔ parsers (round 12): the builder writes the
# spec bytes, the parser must recover EXACTLY the inputs across the
# whole legal parameter space — session-free, so hypothesis can sweep
# boundaries (14-bit WebP dims, 20-bit FLAC rates, 36-bit sample
# counts) in milliseconds.


@given(
    w=st.integers(min_value=1, max_value=16383),  # 14-bit VP8/VP8L field
    h=st.integers(min_value=1, max_value=16383),
    layout=st.sampled_from(["vp8", "vp8l", "vp8x"]),
    alpha=st.booleans(),
)
@settings(max_examples=200)
def test_webp_header_roundtrip(w, h, layout, alpha):
    from creek_spark.operators.multimodal import parse_image_header, webp_bytes

    hdr = parse_image_header(webp_bytes(w, h, layout=layout, alpha=alpha))
    assert hdr is not None and hdr["format"] == "webp"
    assert (hdr["width"], hdr["height"]) == (w, h)
    want_ch = 3 if layout == "vp8" or not alpha else 4
    assert hdr["n_channels"] == want_ch
    assert hdr["n_channels_decoded"] is None


@given(
    w=st.integers(min_value=1, max_value=2**31 - 1),  # LONG tag value
    h=st.integers(min_value=1, max_value=65535),  # SHORT tag value
    big_endian=st.booleans(),
    n_channels=st.integers(min_value=1, max_value=8),
    bit_depth=st.integers(min_value=1, max_value=32),
    behind=st.booleans(),
)
@settings(max_examples=200)
def test_tiff_header_roundtrip(w, h, big_endian, n_channels, bit_depth, behind):
    from creek_spark.operators.multimodal import parse_image_header, tiff_bytes

    hdr = parse_image_header(
        tiff_bytes(
            w, h, big_endian=big_endian, n_channels=n_channels,
            bit_depth=bit_depth, bits_behind_offset=behind,
        )
    )
    assert hdr is not None and hdr["format"] == "tiff"
    assert (hdr["width"], hdr["height"]) == (w, h)
    assert hdr["bit_depth"] == bit_depth
    assert hdr["n_channels"] == n_channels


@given(
    w=st.integers(min_value=1, max_value=2**24),  # ispe is u32; VP8X 24-bit+1
    h=st.integers(min_value=1, max_value=2**24),
    brand=st.sampled_from(["avif", "avis", "heic", "heix", "mif1", "msf1"]),
    bit_depth=st.integers(min_value=1, max_value=16),
    n_channels=st.integers(min_value=1, max_value=4),
    with_thumb=st.booleans(),
)
@settings(max_examples=200)
def test_avif_heic_header_roundtrip(
    w, h, brand, bit_depth, n_channels, with_thumb
):
    from creek_spark.operators.multimodal import avif_bytes, parse_image_header

    thumb = (max(1, w // 2), max(1, h // 2)) if with_thumb else None
    if thumb == (w, h):
        thumb = None  # a same-size "thumbnail" is not a thumbnail
    hdr = parse_image_header(
        avif_bytes(
            w, h, brand=brand, bit_depth=bit_depth,
            n_channels=n_channels, thumb=thumb,
        )
    )
    assert hdr is not None
    assert hdr["format"] == ("avif" if brand in ("avif", "avis") else "heic")
    assert (hdr["width"], hdr["height"]) == (w, h)
    assert hdr["bit_depth"] == bit_depth
    assert hdr["n_channels"] == n_channels


@given(
    rate=st.integers(min_value=1, max_value=(1 << 20) - 1),  # 20-bit field
    channels=st.integers(min_value=1, max_value=8),
    bits=st.integers(min_value=4, max_value=32),
    total=st.integers(min_value=0, max_value=(1 << 36) - 1),
)
@settings(max_examples=200)
def test_flac_header_roundtrip(rate, channels, bits, total):
    from creek_spark.operators.multimodal import flac_bytes, parse_av_header

    hdr = parse_av_header(
        flac_bytes(total_samples=total, rate=rate, channels=channels, bits=bits)
    )
    assert hdr is not None and hdr["format"] == "flac"
    assert hdr["sample_rate"] == rate
    assert hdr["n_channels"] == channels
    assert hdr["bit_depth"] == bits
    assert hdr["duration_ms"] == total * 1000 // rate


@given(
    # one MPEG-1 L3 frame is 1152 samples = 24-36 ms at these rates;
    # shorter CBR streams don't exist and builder+parser both refuse
    ms=st.integers(min_value=48, max_value=10_000),
    kbps=st.sampled_from([32, 64, 96, 128, 192, 320]),
    rate=st.sampled_from([44100, 48000, 32000]),
    channels=st.integers(min_value=1, max_value=2),
    id3=st.booleans(),
)
@settings(max_examples=200)
def test_mp3_header_roundtrip(ms, kbps, rate, channels, id3):
    from creek_spark.operators.multimodal import mp3_bytes, parse_av_header

    ms -= ms % 8  # keep kbps·ms/8 integral so the CBR estimate is exact
    ms = max(ms, 8)
    hdr = parse_av_header(
        mp3_bytes(duration_ms=ms, kbps=kbps, rate=rate, channels=channels, id3=id3)
    )
    assert hdr is not None and hdr["format"] == "mp3"
    assert hdr["sample_rate"] == rate
    assert hdr["n_channels"] == channels
    assert hdr["duration_ms"] == ms
