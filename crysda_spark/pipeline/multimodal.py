"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side architecture is real and tested — schema, partitioning,
Arrow batch shape, mapInPandas signatures. The actual codec work
(PIL/ffmpeg/librosa) is NOT available in this container, so the decode
kernels are stubbed behind ``_HAVE_CODECS`` with a deterministic fake
that preserves shapes; swap the kernel body when the libs exist. The
distributed plan (how bytes move, how batches form, what schema comes
out) is identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..frame import Frame

try:  # pragma: no cover - container has no image/audio libs
    import PIL  # noqa: F401
    _HAVE_CODECS = True
except Exception:
    _HAVE_CODECS = False

IMAGE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def attach_binary(f: Frame, id_col: str, payload_col: str) -> Frame:
    """Normalize a table to the multimodal layout: (id, payload binary,
    meta map). Binary stays opaque; Spark never deserializes it except
    inside the Arrow batches of a decode stage."""
    out = f.sdf.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.create_map(F.lit("bytes"), F.length(payload_col).cast("string")).alias("meta"))
    return Frame(out)


def _fake_decode(payload: bytes, n_feat: int = 8) -> list[float]:
    """Deterministic stand-in for image decode + feature extraction:
    byte-histogram moments, numpy-vectorized like a real kernel would
    be. Replace with a real model/codec when available."""
    import numpy as np
    if payload is None:
        return [0.0] * n_feat
    arr = np.frombuffer(payload[:4096], dtype=np.uint8)
    buckets = np.bincount(arr % n_feat, minlength=n_feat)
    total = max(int(buckets.sum()), 1)
    return (buckets / total).tolist()


def decode_images(f: Frame, id_col: str = "id", payload_col: str = "payload",
                  n_feat: int = 8) -> Frame:
    """Decode/feature-extract images via mapInPandas (Arrow batches).
    Partition-parallel; each batch holds ~10k payloads; output schema is
    fixed so downstream plans don't depend on the kernel."""
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            if _HAVE_CODECS:  # pragma: no cover
                raise NotImplementedError("real codec path: PIL decode here")
            feats = pdf[payload_col].map(lambda p: _fake_decode(p, n_feat))
            yield pd.DataFrame({
                "id": pdf[id_col],
                "width": 0, "height": 0, "channels": 0,
                "features": feats,
            })

    return Frame(f.sdf.mapInPandas(kernel, schema=schema))


def sample_frames(f: Frame, every_n: int = 10, id_col: str = "id",
                  payload_col: str = "payload") -> Frame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame. The split kernel is stubbed (returns the original
    payload as frame 0); the explode-shaped plan is the real thing."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            if _HAVE_CODECS:  # pragma: no cover
                raise NotImplementedError("real codec path: ffmpeg frame split here")
            yield pd.DataFrame({
                "id": pdf[id_col],
                "frame_idx": 0,
                "payload": pdf[payload_col],
            })

    return Frame(f.sdf.mapInPandas(kernel, schema=FRAME_SCHEMA))


def resize_stub(f: Frame, width: int, height: int) -> Frame:
    """Resize plumbing — passes payloads through the same Arrow path."""
    if _HAVE_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path: PIL resize here")
    return f
