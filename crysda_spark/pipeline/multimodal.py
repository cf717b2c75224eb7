"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side architecture is real and tested — schema, partitioning,
Arrow batch shape, mapInPandas signatures. One codec path is REAL and
dependency-free: uncompressed 24/32-bit BMP payloads decode, resize,
and feature-extract end-to-end through ``pipeline.codecs`` (pure
struct+numpy). Codec work needing external libs (jpeg/png via PIL,
video via ffmpeg, audio via librosa) is NOT available in this
container, so those kernels stay stubbed behind ``_HAVE_CODECS`` with
a deterministic fake that preserves shapes; swap the kernel body when
the libs exist. The distributed plan (how bytes move, how batches
form, what schema comes out) is identical either way.
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


def _sniff(payload) -> str | None:
    """Real-codec dispatch on magic bytes: 'bmp' / 'ppm' / None."""
    if payload is None or len(payload) < 2:
        return None
    magic = bytes(payload[:2])
    if magic == b"BM":
        return "bmp"
    if magic == b"P6":
        return "ppm"
    return None


def _is_bmp(payload) -> bool:
    return _sniff(payload) == "bmp"


def decode_images(f: Frame, id_col: str = "id", payload_col: str = "payload",
                  n_feat: int = 8) -> Frame:
    """Decode/feature-extract images via mapInPandas (Arrow batches).
    Partition-parallel; each batch holds ~10k payloads; output schema is
    fixed so downstream plans don't depend on the kernel.

    BMP payloads (magic-sniffed) take the REAL codec path —
    ``codecs.decode_bmp`` + ``codecs.image_features`` — yielding true
    width/height/channels. Other formats fall to PIL (stubbed in this
    container) or the deterministic fake with width/height/channels=0."""
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd
        from .codecs import decode_bmp, decode_ppm, image_features
        real = {"bmp": decode_bmp, "ppm": decode_ppm}
        for pdf in batches:
            ids, ws, hs, cs, feats = [], [], [], [], []
            for pid, payload in zip(pdf[id_col], pdf[payload_col]):
                kind = _sniff(payload)
                if kind in real:
                    arr = real[kind](bytes(payload))
                    h, w, c = arr.shape
                    fs = image_features(arr, n_feat)
                elif _HAVE_CODECS:  # pragma: no cover
                    raise NotImplementedError("real codec path: PIL decode here")
                else:
                    w = h = c = 0
                    fs = _fake_decode(payload, n_feat)
                ids.append(pid); ws.append(w); hs.append(h)
                cs.append(c); feats.append(fs)
            yield pd.DataFrame({
                "id": ids, "width": ws, "height": hs, "channels": cs,
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


def resize_images(f: Frame, width: int, height: int, id_col: str = "id",
                  payload_col: str = "payload") -> Frame:
    """Resize through the Arrow path: BMP payloads are REALLY resized
    (decode → nearest-neighbor resample → re-encode, pure numpy) and
    come back as valid BMP bytes of the target size; other formats pass
    through unchanged (PIL path stubbed in this container)."""
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd
        from .codecs import (decode_bmp, decode_ppm, encode_bmp, encode_ppm,
                             resize_nearest)
        real = {"bmp": (decode_bmp, encode_bmp), "ppm": (decode_ppm, encode_ppm)}
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                kind = _sniff(payload)
                if kind in real:
                    dec, enc = real[kind]
                    out.append(enc(
                        resize_nearest(dec(bytes(payload)), width, height)))
                elif _HAVE_CODECS:  # pragma: no cover
                    raise NotImplementedError("real codec path: PIL resize here")
                else:
                    out.append(payload)
            yield pd.DataFrame({"id": pdf[id_col], "payload": out})

    return Frame(f.sdf.mapInPandas(kernel, schema=schema))


def resize_stub(f: Frame, width: int, height: int) -> Frame:
    """Back-compat alias for the pre-codec API — see resize_images."""
    return resize_images(f, width, height)
