"""CRC-64-AVRO (Rabin) schema fingerprinting.

The reference fingerprints every generated Avro schema and keys its registry
on the base64url form (internal/dao/schemas.go:96-112); every WAL message
carries the fingerprint so readers can decode heterogeneous streams
(client.go:265-286).  The algorithm below is the public fingerprint from the
Apache Avro specification ("single-object encoding" section).
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import types as T

_EMPTY = 0xC15D213AA4D7A795
_TABLE: list[int] = []


def _init_table() -> None:
    for i in range(256):
        fp = i
        for _ in range(8):
            fp = (fp >> 1) ^ (_EMPTY & -(fp & 1))
        _TABLE.append(fp)


_init_table()


def crc64_avro(data: bytes) -> int:
    """64-bit Rabin fingerprint per the Avro spec."""
    fp = _EMPTY
    for b in data:
        fp = (fp >> 8) ^ _TABLE[(fp ^ b) & 0xFF]
    return fp


def avro_fingerprint(data: bytes) -> str:
    """base64url(little-endian 8-byte CRC-64-AVRO) — the registry key form
    (internal/dao/schemas.go:96-112 uses base64.RawURLEncoding)."""
    fp = crc64_avro(data)
    return base64.urlsafe_b64encode(fp.to_bytes(8, "little")).rstrip(b"=").decode()


def canonical_schema_json(schema: T.StructType) -> str:
    """Deterministic JSON form of a Spark schema for fingerprinting.

    The reference fingerprints the canonical Avro schema JSON; here the
    engine's native schema language is Spark's, so we canonicalize that:
    sorted keys, no whitespace, metadata included (pgKey/pgType are part of
    the contract)."""
    return json.dumps(schema.jsonValue(), sort_keys=True, separators=(",", ":"))


def fingerprint_schema(schema: T.StructType) -> str:
    return avro_fingerprint(canonical_schema_json(schema).encode())
