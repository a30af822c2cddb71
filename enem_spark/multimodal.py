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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_md5", T.StringType()),
        T.StructField("n_frame_bytes", T.LongType()),
    ]
)


def frame_sample(
    media: DataFrame,
    n_frames: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling plumbing: one media row -> up to ``n_frames`` evenly
    spaced frame rows (1:N explode through mapInPandas, Arrow both ways).

    A real video decoder would seek keyframes with ffmpeg — STUBBED here as
    deterministic byte-range slices (equal chunks, first slice of each) so
    the Spark-side shape (binary in, exploded binary out, per-frame
    metadata) is fully exercised and testable. Output partitioning follows
    the input (no shuffle); at scale cap per-task memory by sizing input
    files, not by collecting frames."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                k = min(n_frames, max(len(b), 1))
                step = max(len(b) // k, 1)
                for i in range(k):
                    frame = b[i * step : i * step + step]
                    if not frame:
                        break
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": i,
                            "frame_bytes": frame,
                            "frame_md5": hashlib.md5(frame).hexdigest(),
                            "n_frame_bytes": len(frame),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, FRAME_SCHEMA
    )


def resize_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Image-resize placeholder: real impl needs PIL (absent here).

    The deterministic stand-in keeps the contract (binary -> binary whose
    length encodes target dims) so pipeline plumbing stays testable."""
    raise NotImplementedError(
        "image resize requires PIL/libvips, not present in this container; "
        "the frame_sample/featurize plumbing is the tested surface"
    )
