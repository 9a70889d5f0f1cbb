"""CRC-64-AVRO fingerprint tests.

The algorithm is the Avro spec's Rabin fingerprint; the spec publishes the
test vector fp64("") != 0 and the well-known value for "foo" via the empty
polynomial seed.  We verify determinism, sensitivity, and the base64url
(no-padding) form the reference's registry keys use
(internal/dao/schemas.go:96-112).
"""

from __future__ import annotations

from pyspark.sql import types as T

from creek_spark.types.fingerprint import (
    avro_fingerprint,
    canonical_schema_json,
    crc64_avro,
    fingerprint_schema,
)


def test_crc64_avro_known_vector():
    # Avro spec "CRC-64-AVRO" seed: empty input returns the seed itself.
    assert crc64_avro(b"") == 0xC15D213AA4D7A795
    # deterministic + 64-bit
    v = crc64_avro(b'{"type":"record"}')
    assert v == crc64_avro(b'{"type":"record"}')
    assert 0 <= v < 2**64


def test_fingerprint_is_base64url_no_padding():
    fp = avro_fingerprint(b"hello")
    assert "=" not in fp
    assert "+" not in fp and "/" not in fp
    assert len(fp) == 11  # 8 bytes → ceil(8*4/3)=11 chars unpadded


def test_schema_fingerprint_stability_and_sensitivity():
    s1 = T.StructType([T.StructField("a", T.IntegerType(), True)])
    s2 = T.StructType([T.StructField("a", T.IntegerType(), True)])
    s3 = T.StructType([T.StructField("a", T.LongType(), True)])
    assert fingerprint_schema(s1) == fingerprint_schema(s2)
    assert fingerprint_schema(s1) != fingerprint_schema(s3)
    # metadata (pgKey) participates in identity
    s4 = T.StructType(
        [T.StructField("a", T.IntegerType(), True, {"pgKey": True})]
    )
    assert fingerprint_schema(s1) != fingerprint_schema(s4)


def test_canonical_json_is_key_sorted():
    s = T.StructType([T.StructField("a", T.IntegerType(), True)])
    j = canonical_schema_json(s)
    assert " " not in j
    assert j == canonical_schema_json(s)
