"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition-friendly batch shape, Arrow
transfer via mapInPandas) is real and tested; the actual codec step is
STUBBED because no image/audio library ships in this environment — decode
functions either raise NotImplementedError (strict mode) or produce a
deterministic fake payload (plumbing-test mode).

Design for 100 TB: binary payloads ride in parquet with the metadata
columns beside them; decode/feature-extract runs as `mapInPandas` so each
Arrow batch amortizes Python overhead, and `spark.sql.files.maxPartitionBytes`
controls batch sizing.  Column pruning means metadata-only queries never
read the blob pages.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feat_dim", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Derive typed metadata columns from an opaque binary column — stays
    JVM-side (length/hash built-ins), no decode needed."""
    return df.withColumn("n_bytes", F.length(F.col(content_col)).cast("long")).withColumn(
        "content_md5", F.md5(F.col(content_col))
    )


def _decode_stub(kind: str, payload: bytes, *, fake: bool) -> list[float]:
    if not fake:
        # Real deployments plug in PIL/librosa/ffmpeg here.
        raise NotImplementedError(
            f"{kind} decode requires a codec library not present in this "
            "environment; run with fake=True to exercise the plumbing"
        )
    # Deterministic fake: 4 features from byte stats, so tests can assert.
    if payload is None:
        return []
    n = len(payload)
    s = sum(payload[:64])
    return [float(n), float(s % 251), float(payload[0] if n else 0), float(n % 7)]


def extract_features(
    media: DataFrame, *, fake_decode: bool = False, batch_decoder: Callable | None = None
) -> DataFrame:
    """Decode/feature-extract media via mapInPandas (Arrow batches).

    ``batch_decoder(kind, content_series) -> list[list[float]]`` may be
    injected for real codecs; default uses the stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(k, c, fake=fake_decode)
                if batch_decoder is None
                else batch_decoder(k, c)
                for k, c in zip(pdf["kind"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else None for c in pdf["content"]],
                    "feat_dim": [len(f) for f in feats],
                    "features": feats,
                }
            )

    cols = ["media_id", "kind", "content"]
    return media.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    *,
    width: int = 224,
    height: int = 224,
    fake_resize: bool = False,
    batch_resizer: Callable | None = None,
) -> DataFrame:
    """Resize/transcode image payloads via mapInPandas.

    Same plumbing contract as ``extract_features``: Arrow-batched rows in,
    binary payloads out, schema fixed up front.  ``batch_resizer(content,
    width, height) -> bytes`` plugs in a real codec (PIL etc.); the stub
    either raises (strict) or emits a deterministic truncated payload
    (plumbing-test mode) so batch shape, null handling and schema are
    testable without image libraries."""

    def _one(content, *, fake: bool):
        if content is None:
            return None
        if batch_resizer is not None:
            return batch_resizer(content, width, height)
        if not fake:
            raise NotImplementedError(
                "image resize requires a codec library not present in this "
                "environment; run with fake_resize=True to exercise the "
                "plumbing"
            )
        # deterministic fake: cap payload at width*height bytes
        return bytes(content[: width * height])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["kind"] == "image"].copy()
            out["content"] = [
                _one(c, fake=fake_resize) for c in out["content"]
            ]
            out["width"] = width
            out["height"] = height
            yield out[["media_id", "kind", "content", "mime", "width", "height"]]

    cols = ["media_id", "kind", "content", "mime"]
    return media.select(*cols).mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(
    media: DataFrame, *, every_n_seconds: int = 5, duration_meta_key: str = "duration_s"
) -> DataFrame:
    """Expand each video row into frame-sample tasks (media_id, frame_ts) —
    pure JVM sequence/explode, demonstrating how per-frame work items are
    generated without touching payload bytes."""
    dur = F.coalesce(
        F.element_at(F.col("meta"), duration_meta_key).cast("int"), F.lit(0)
    )
    ts = F.sequence(F.lit(0), dur, F.lit(every_n_seconds))
    return media.where(F.col("kind") == "video").select(
        "media_id", F.explode(ts).alias("frame_ts")
    )
