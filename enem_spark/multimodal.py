"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a metadata
struct; decode/feature-extract run as Arrow-batched functions over
mapInPandas. The decode step itself is STUBBED (no image/audio libs in this
container): `decode_stub` raises NotImplementedError unless
`deterministic_fake=True`, in which case it derives a reproducible fake
feature vector from the bytes — the Spark-side plumbing (schema, batching,
partitioning, UDF signature) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def decode_stub(payload: bytes, deterministic_fake: bool) -> list[float]:
    """Placeholder for a real image/audio decoder.

    Real decode would use PIL/ffmpeg — not available in this container.
    The deterministic fake derives FEATURE_DIM floats from the digest so
    downstream plumbing (schema, batch shape, joins) is fully exercised."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present here; "
            "run with deterministic_fake=True for plumbing tests"
        )
    digest = hashlib.sha256(payload).digest()
    return [round(b / 255.0, 6) for b in digest[:FEATURE_DIM]]


def featurize_media(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    media_type: str = "image",
    deterministic_fake: bool = True,
) -> DataFrame:
    """mapInPandas featurizer: (id, binary payload) -> MEDIA_SCHEMA rows.

    Arrow-batched; one pass; no shuffle. At scale, partition the input by
    payload size (spark.sql.files.maxPartitionBytes) so batches stay bounded."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": media_type,
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "features": payloads.map(
                        lambda b: decode_stub(bytes(b), deterministic_fake)
                        if b is not None
                        else None
                    ),
                }
            )

    return media.select(
        F.col(id_col), F.col(payload_col)
    ).mapInPandas(batches, MEDIA_SCHEMA)
