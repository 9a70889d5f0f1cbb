"""Property-based round-trip of the from-spec Avro binary codec (pure
Python — no Spark session, so hypothesis can run hundreds of examples)."""

from __future__ import annotations

import datetime
import decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from creek_spark.sources.avro_codec import (
    _compile_decoder,
    _compile_encoder,
    _Cursor,
    dec_long,
    enc_long,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(I64)
@settings(max_examples=300)
def test_varint_roundtrip(n):
    out = bytearray()
    enc_long(n, out)
    c = _Cursor(bytes(out))
    assert dec_long(c) == n
    assert c.pos == len(out)  # no trailing bytes


REC = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": ["null", "long"]},
        {"name": "s", "type": "string"},
        {"name": "b", "type": ["null", "bytes"]},
        {"name": "f", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "dec", "type": ["null", {"type": "bytes", "logicalType": "decimal",
                                          "precision": 18, "scale": 4}]},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
    ],
}

_dec = st.decimals(
    min_value=decimal.Decimal("-99999999"),
    max_value=decimal.Decimal("99999999"),
    places=4,
    allow_nan=False,
    allow_infinity=False,
)
_ts = st.datetimes(
    min_value=datetime.datetime(1900, 1, 1),
    max_value=datetime.datetime(2200, 1, 1),
).map(lambda d: d.replace(tzinfo=datetime.timezone.utc))

ROW = st.fixed_dictionaries(
    {
        "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "l": st.none() | I64,
        "s": st.text(max_size=40),
        "b": st.none() | st.binary(max_size=40),
        "f": st.booleans(),
        "d": st.floats(allow_nan=False, allow_infinity=False),
        "dec": st.none() | _dec,
        "day": st.dates(),
        "ts": _ts,
        "xs": st.lists(I64, max_size=8),
    }
)


@given(ROW)
@settings(max_examples=200)
def test_record_roundtrip(row):
    enc = _compile_encoder(REC)
    dec = _compile_decoder(REC)
    out = bytearray()
    enc(row, out)
    c = _Cursor(bytes(out))
    back = dec(c)
    assert c.pos == len(out)
    for k, v in row.items():
        got = back[k]
        if isinstance(v, decimal.Decimal):
            assert got == v.quantize(decimal.Decimal("0.0001"))
        else:
            assert got == v, k
