"""Avro single-object payload codec (O11) — pure Python, Arrow-batched.

The reference publishes WAL messages as Avro binary in the single-object
encoding (internal/mq/wal.go:52-58: `avro.Marshal(schema, wal)` framed by
client.go:265-286), with the schema built by messages.go:58-89
(`publish_message` record: fingerprint, source record, op enum, sent_at,
before/after null-unions).

The spark-avro connector jar is not on this classpath (from_avro/to_avro
raise AVRO_NOT_LOADED), so the body codec here is a from-spec
implementation of Avro binary encoding — zigzag varints, length-prefixed
bytes/strings, union indexes, enum indexes, blocked arrays, and the
decimal/date/timestamp-micros logical types — run as an Arrow-batched
mapInPandas stage (the sanctioned Python escape hatch; this is a
format-boundary operator, not a hot relational path).  Where the connector
jar IS present, `creek_spark.sources.wire` can swap to to_avro/from_avro
without changing the frame layout.

Schema mapping (Spark → Avro):
    string→string  int→int  long→long  float→float  double→double
    boolean→boolean  binary→bytes  date→int/date
    timestamp→long/timestamp-micros  decimal(p,s)→bytes/decimal
    array<e>→array  struct→record  nullable field→["null", T]

One deliberate extension over the reference's message: the envelope's
`unchanged_toast array<string>` field rides along as a null-union (the
reference *omits* unchanged TOAST columns from its Avro map value —
map-typed rows can do that, record-typed rows cannot; see
types/envelope.py).  Fingerprints are CRC-64-AVRO over the canonical
schema (types/fingerprint.py), carried little-endian in the frame exactly
as the spec's single-object encoding prescribes.
"""

from __future__ import annotations

import datetime
import decimal
import math
import struct as _struct
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from creek_spark.types.envelope import OPS, envelope_schema
from creek_spark.types.fingerprint import fingerprint_schema

MAGIC = b"\xc3\x01"
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)


# ------------------------------------------------------------ Avro schema


def spark_type_to_avro(dt: T.DataType, name: str) -> Any:
    """Spark DataType → Avro schema fragment (JSON-style dict/str)."""
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": spark_type_to_avro(dt.elementType, name)}
    if isinstance(dt, T.StructType):
        return struct_to_avro_record(dt, name)
    raise TypeError(f"no Avro mapping for Spark type {dt!r}")


def struct_to_avro_record(st: T.StructType, name: str, namespace: str | None = None) -> dict:
    rec: dict = {"type": "record", "name": name, "fields": []}
    if namespace:
        rec["namespace"] = namespace
    for f in st.fields:
        ft = spark_type_to_avro(f.dataType, f"{name}_{f.name}")
        if f.nullable:
            ft = ["null", ft]
        rec["fields"].append({"name": f.name, "type": ft})
    return rec


def envelope_avro_schema(env_struct: T.StructType) -> dict:
    """The `publish_message` record (messages.go:58-89): op becomes the
    reference's 6-symbol enum; before/after records get their namespaced
    shapes; nullable fields become null-unions."""
    fields = []
    for f in env_struct.fields:
        if f.name == "op":
            ft: Any = {"type": "enum", "name": "op", "symbols": list(OPS)}
        elif f.name in ("before", "after") and isinstance(f.dataType, T.StructType):
            ft = struct_to_avro_record(f.dataType, "row", namespace=f.name)
        else:
            ft = spark_type_to_avro(f.dataType, f.name)
        if f.nullable:
            ft = ["null", ft]
        fields.append({"name": f.name, "type": ft})
    return {"type": "record", "name": "publish_message", "fields": fields}


# -------------------------------------------------------- binary encoding


def _zigzag(n: int) -> int:
    return ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def enc_long(n: int, out: bytearray) -> None:
    u = _zigzag(int(n))
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def enc_bytes(b: bytes, out: bytearray) -> None:
    enc_long(len(b), out)
    out.extend(b)


def _is_null(v: Any) -> bool:
    if v is None:
        return True
    # pandas NaT / float NaN scalars (never arrays/lists)
    if isinstance(v, float) and math.isnan(v):
        return True
    return v.__class__.__name__ == "NaTType"


def _to_micros(v: Any) -> int:
    """datetime / pandas.Timestamp → µs since epoch (UTC)."""
    if hasattr(v, "value"):  # pandas.Timestamp: ns since epoch
        return int(v.value) // 1_000
    if v.tzinfo is None:
        v = v.replace(tzinfo=datetime.timezone.utc)
    return int((v - _EPOCH_TS) / datetime.timedelta(microseconds=1))


def _compile_encoder(schema: Any) -> Callable[[Any, bytearray], None]:
    """Avro schema fragment → fn(value, out).  Compiled once per schema,
    reused for every row in every Arrow batch."""
    if isinstance(schema, list):  # union — only [null, T] is generated
        branch = _compile_encoder(schema[1])

        def enc_union(v, out):
            if _is_null(v):
                out.append(0x00)  # zigzag(0): null branch
            else:
                out.append(0x02)  # zigzag(1)
                branch(v, out)

        return enc_union
    if schema == "string":
        return lambda v, out: enc_bytes(str(v).encode("utf-8"), out)
    if schema in ("int", "long"):
        return lambda v, out: enc_long(int(v), out)
    if schema == "float":
        return lambda v, out: out.extend(_struct.pack("<f", float(v)))
    if schema == "double":
        return lambda v, out: out.extend(_struct.pack("<d", float(v)))
    if schema == "boolean":
        return lambda v, out: out.append(1 if v else 0)
    if schema == "bytes":
        return lambda v, out: enc_bytes(bytes(v), out)
    t = schema["type"] if isinstance(schema, dict) else schema
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if logical == "date":
        return lambda v, out: enc_long(
            (v if isinstance(v, datetime.date) else v.date()).toordinal()
            - _EPOCH_DATE.toordinal(),
            out,
        )
    if logical in ("timestamp-micros", "local-timestamp-micros"):
        return lambda v, out: enc_long(_to_micros(v), out)
    if logical == "decimal":
        scale = schema["scale"]

        def enc_dec(v, out):
            unscaled = int(
                decimal.Decimal(v).scaleb(scale).to_integral_value(
                    rounding=decimal.ROUND_HALF_UP
                )
            )
            n = max(1, (unscaled.bit_length() + 8) // 8)
            enc_bytes(unscaled.to_bytes(n, "big", signed=True), out)

        return enc_dec
    if t == "enum":
        idx = {s: i for i, s in enumerate(schema["symbols"])}
        return lambda v, out: enc_long(idx[v], out)
    if t == "array":
        item = _compile_encoder(schema["items"])

        def enc_arr(v, out):
            v = list(v)
            if v:
                enc_long(len(v), out)
                for x in v:
                    item(x, out)
            out.append(0x00)  # end of blocks

        return enc_arr
    if t == "record":
        fields = [(f["name"], _compile_encoder(f["type"])) for f in schema["fields"]]

        def enc_rec(v, out):
            get = v.get if isinstance(v, dict) else lambda k: getattr(v, k)
            for fname, fenc in fields:
                fenc(get(fname), out)

        return enc_rec
    # plain type wrapped in a dict, e.g. {"type": "long", "logicalType": ...}
    if isinstance(schema, dict) and t in (
        "string", "int", "long", "float", "double", "boolean", "bytes"
    ):
        return _compile_encoder(t)
    raise TypeError(f"no encoder for Avro schema {schema!r}")


# -------------------------------------------------------- binary decoding


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b


def dec_long(c: _Cursor) -> int:
    shift = u = 0
    while True:
        b = c.buf[c.pos]
        c.pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u)
        shift += 7


def dec_bytes(c: _Cursor) -> bytes:
    return c.read(dec_long(c))


def _compile_decoder(schema: Any) -> Callable[[_Cursor], Any]:
    if isinstance(schema, list):
        branch = _compile_decoder(schema[1])

        def dec_union(c):
            return None if dec_long(c) == 0 else branch(c)

        return dec_union
    if schema == "string":
        return lambda c: dec_bytes(c).decode("utf-8")
    if schema in ("int", "long"):
        return dec_long
    if schema == "float":
        return lambda c: _struct.unpack("<f", c.read(4))[0]
    if schema == "double":
        return lambda c: _struct.unpack("<d", c.read(8))[0]
    if schema == "boolean":
        return lambda c: c.read(1) == b"\x01"
    if schema == "bytes":
        return dec_bytes
    t = schema["type"] if isinstance(schema, dict) else schema
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if logical == "date":
        return lambda c: datetime.date.fromordinal(
            dec_long(c) + _EPOCH_DATE.toordinal()
        )
    if logical == "timestamp-micros":
        return lambda c: _EPOCH_TS + datetime.timedelta(microseconds=dec_long(c))
    if logical == "local-timestamp-micros":
        naive_epoch = _EPOCH_TS.replace(tzinfo=None)
        return lambda c: naive_epoch + datetime.timedelta(microseconds=dec_long(c))
    if logical == "decimal":
        scale = schema["scale"]

        def dec_dec(c):
            raw = dec_bytes(c)
            return decimal.Decimal(
                int.from_bytes(raw, "big", signed=True)
            ).scaleb(-scale)

        return dec_dec
    if t == "enum":
        symbols = schema["symbols"]
        return lambda c: symbols[dec_long(c)]
    if t == "array":
        item = _compile_decoder(schema["items"])

        def dec_arr(c):
            out = []
            while True:
                n = dec_long(c)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (spec) — skip size
                    n = -n
                    dec_long(c)
                for _ in range(n):
                    out.append(item(c))

        return dec_arr
    if t == "record":
        fields = [(f["name"], _compile_decoder(f["type"])) for f in schema["fields"]]

        def dec_rec(c):
            return {fname: fdec(c) for fname, fdec in fields}

        return dec_rec
    if isinstance(schema, dict) and t in (
        "string", "int", "long", "float", "double", "boolean", "bytes"
    ):
        return _compile_decoder(t)
    raise TypeError(f"no decoder for Avro schema {schema!r}")


# ------------------------------------------------------ Spark integration


def _fp_bytes(fp_b64url: str) -> bytes:
    import base64

    pad = "=" * ((4 - len(fp_b64url) % 4) % 4)
    return base64.urlsafe_b64decode(fp_b64url + pad)


def _fp_str(fp: bytes) -> str:
    import base64

    return base64.urlsafe_b64encode(fp).rstrip(b"=").decode()


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.StringType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def encode_envelope_avro(env_df: DataFrame, row_struct: T.StructType) -> DataFrame:
    """Envelope rows → single-object frames: C3 01 + fp(8B LE) + Avro body
    (the wal.go:52-58 produce path).  The frame fingerprint is the ROW
    schema's registry fingerprint — the key a reader resolves via
    SchemaRegistry.get, exactly like the reference's fingerprint-keyed
    schema fetch (client.go:745-782)."""
    env_struct = envelope_schema(row_struct)
    avsc = envelope_avro_schema(env_struct)
    fp = fingerprint_schema(row_struct)
    fp_raw = _fp_bytes(fp)
    cols = [f.name for f in env_struct.fields]

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        enc = _compile_encoder(avsc)  # compile once per task
        for pdf in batches:
            frames = []
            for row in pdf[cols].itertuples(index=False):
                body = bytearray(MAGIC)
                body.extend(fp_raw)
                enc(row._asdict(), body)
                frames.append(bytes(body))
            yield pd.DataFrame({"fingerprint": fp, "frame": frames})

    return env_df.mapInPandas(encode, schema=FRAME_SCHEMA)


def decode_envelope_avro_evolved(
    frames_df: DataFrame,
    schemas: dict[str, T.StructType],
    frame_col: str = "frame",
) -> DataFrame:
    """Heterogeneous-stream decode: one stream carrying MULTIPLE row-shape
    generations (DDL evolution → new fingerprint, O10/§3.2).  Each
    generation decodes against its own schema, then the generations
    reconcile into the superset column set (old rows surface with nulls
    for added columns) — the Avro-wire counterpart of
    wire.decode_frames + wire.reconcile_generations.

    The per-generation split filters on the frame's embedded fingerprint
    bytes (a cheap JVM-side prefix compare), so each decode stage only
    deserializes its own generation's frames."""
    from creek_spark.sources.wire import reconcile_generations

    decoded = {}
    for fp, row_struct in schemas.items():
        mine = frames_df.where(
            F.substring(F.col(frame_col), 3, 8) == F.lit(_fp_bytes(fp))
        )
        decoded[fp] = decode_envelope_avro(mine, {fp: row_struct}, frame_col)
    # before/after struct shapes differ between generations; flatten to
    # the envelope's superset by name via unionByName(allowMissingColumns)
    # over the STRUCT FIELDS: expand structs, reconcile, re-nest.
    flat = {}
    for fp, df in decoded.items():
        env_cols = [c for c in df.columns if c not in ("before", "after")]
        flat[fp] = df.select(
            *env_cols,
            *[
                F.col(f"before.{f.name}").alias(f"_before_{f.name}")
                for f in df.schema["before"].dataType.fields
            ],
            F.col("before").isNotNull().alias("_has_before"),
            *[
                F.col(f"after.{f.name}").alias(f"_after_{f.name}")
                for f in df.schema["after"].dataType.fields
            ],
            F.col("after").isNotNull().alias("_has_after"),
        )
    merged = reconcile_generations(flat)
    before_fields = sorted(
        c[len("_before_"):] for c in merged.columns if c.startswith("_before_")
    )
    after_fields = sorted(
        c[len("_after_"):] for c in merged.columns if c.startswith("_after_")
    )
    env_cols = [
        c
        for c in merged.columns
        if not c.startswith(("_before_", "_after_", "_has_"))
    ]
    return merged.select(
        *env_cols,
        F.when(
            F.col("_has_before"),
            F.struct(*[F.col(f"_before_{f}").alias(f) for f in before_fields]),
        ).alias("before"),
        F.when(
            F.col("_has_after"),
            F.struct(*[F.col(f"_after_{f}").alias(f) for f in after_fields]),
        ).alias("after"),
    )


def decode_envelope_avro(
    frames_df: DataFrame,
    schemas: dict[str, T.StructType],
    frame_col: str = "frame",
) -> DataFrame:
    """Frames → envelope rows, fingerprint-dispatched: one stream carries
    many schema generations; each frame's 8-byte fingerprint selects the
    decoder (client.go:265-286).  `schemas` maps registry fingerprint →
    row StructType (e.g. from SchemaRegistry); frames with unknown
    fingerprints raise — the caller quarantines via wire.split_frames
    first.  All listed schemas must share one envelope column set (they
    do: the envelope shape is fixed, only row shapes vary); the output
    uses the first schema's envelope struct."""
    env_structs = {fp: envelope_schema(rs) for fp, rs in schemas.items()}
    first_env = next(iter(env_structs.values()))
    avro_schemas = {fp: envelope_avro_schema(es) for fp, es in env_structs.items()}

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        decoders = {
            _fp_bytes(fp): _compile_decoder(avsc)
            for fp, avsc in avro_schemas.items()
        }
        for pdf in batches:
            rows = []
            for frame in pdf[frame_col]:
                frame = bytes(frame)
                if frame[:2] != MAGIC:
                    raise ValueError("bad single-object magic")
                dec = decoders.get(frame[2:10])
                if dec is None:
                    raise KeyError(
                        f"unknown schema fingerprint {_fp_str(frame[2:10])}"
                    )
                rows.append(dec(_Cursor(frame, 10)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in first_env.fields]
            )

    return frames_df.mapInPandas(decode, schema=first_env)
