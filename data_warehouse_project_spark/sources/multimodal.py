"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` payloads + typed metadata, processed with
Arrow-batched ``mapInPandas``.

The Spark-side architecture is fully real — schema, partition-preserving
batch iteration, bounded batch sizes, deterministic fake features for
tests. The actual codec step is STUBBED (``decode_stub``): this
container has no image/audio libraries, so the stub either raises
``NotImplementedError`` (strict mode) or produces deterministic fake
features derived from the payload bytes (test mode). Swapping in a real
decoder (PIL / torchaudio / pyav) changes only ``_decode_one``.

At 100 TB: binary payloads never shuffle — mapInPandas runs on the scan
partitioning; only the (id, features, metadata) projection moves
downstream. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
independent of payload size distribution.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("source_uri", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_schema() -> T.StructType:
    return MEDIA_SCHEMA


def _decode_one(media_type: str, payload: bytes, strict: bool) -> dict:
    """STUB decode step. Real implementation would dispatch to
    PIL/libav/etc. Deterministic fake: dimensions and an 8-d feature
    derived from the payload digest, so tests are reproducible."""
    if strict:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "plug a real decoder into sources.multimodal._decode_one"
        )
    digest = hashlib.sha256(payload or b"").digest()
    w = 64 + digest[0]
    h = 64 + digest[1]
    feature = [b / 255.0 for b in digest[:8]]
    return {
        "width": int(w) if media_type == "image" else None,
        "height": int(h) if media_type == "image" else None,
        "duration_ms": int.from_bytes(digest[2:4], "big")
        if media_type in ("audio", "video")
        else None,
        "feature": feature,
    }


def extract_media_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """binary payload → per-item features via Arrow-batched mapInPandas.

    Partition-preserving (no shuffle); payload bytes are dropped from
    the output so only compact features flow downstream.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                decoded = _decode_one(row["media_type"], payload, strict)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "media_type": row["media_type"],
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        **decoded,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)
