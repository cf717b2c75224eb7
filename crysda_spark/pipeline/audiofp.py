"""Audio fingerprinting + offset-voting clip matching (Wang 2003 —
the Shazam constellation algorithm), the audio twin of the image
pHash family: condense each clip to sparse, alignment-robust landmark
hashes, then find which indexed clip (and at what offset) a query
excerpt came from with ONE equi-join and a vote count — the corpus
audio never shuffles sample data.

Pipeline shape per clip (pure numpy over the repo's real RIFF/WAVE
codec — no audio libraries in the container):
  PCM → mono → Hann STFT (rfft) → local spectral peaks (constellation)
  → anchor-target pairing in a forward time window → 24-bit landmark
  hash ``(f_anchor, f_target, dt)`` packed into an int64 column.

Matching: query landmarks equi-join index landmarks on the hash; a
true match piles votes on ONE (query, clip, t_index − t_query) offset
bin, noise spreads thinly — the top-voted bin is the verdict. This is
how a 100 TB audio corpus is deduped / copyright-scanned: landmarks
are ~tens of bytes per second of audio, the join keys are ints, and
the vote is a map-side-combinable count.

The reference engine has no audio operators; this extends the
multimodal plumbing (SURVEY §2.11), composing with
``codecs.decode_wav`` exactly like phash composes with the image
codecs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ..frame import Frame

FRAME = 512
HOP = 256


def _stft_mag(samples: np.ndarray, frame: int = FRAME,
              hop: int = HOP) -> np.ndarray:
    """Magnitude spectrogram (n_frames × frame//2+1) of a mono-folded
    clip: Hann window, real FFT, deterministic numpy throughout."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n < frame:
        return np.zeros((0, frame // 2 + 1))
    n_frames = 1 + (n - frame) // hop
    idx = (np.arange(frame)[None, :]
           + hop * np.arange(n_frames)[:, None])
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    return np.abs(np.fft.rfft(mono[idx] * win[None, :], axis=1))


def _peaks(mag: np.ndarray, dt: int = 3, df: int = 5,
           min_rel: float = 2.0) -> np.ndarray:
    """Constellation points: (t, f) bins that are the strict maximum of
    their (2·dt+1) × (2·df+1) neighborhood AND at least ``min_rel`` ×
    the global mean magnitude (kills silence/noise-floor 'peaks').
    Neighborhood max via shifted-array reduction — no scipy."""
    if mag.size == 0:
        return np.zeros((0, 2), dtype=np.int64)
    pad = np.pad(mag, ((dt, dt), (df, df)), constant_values=-1.0)
    neigh = np.full_like(mag, -np.inf)
    t_len, f_len = mag.shape
    for i in range(2 * dt + 1):
        for j in range(2 * df + 1):
            if i == dt and j == df:
                continue
            neigh = np.maximum(neigh, pad[i:i + t_len, j:j + f_len])
    keep = (mag > neigh) & (mag >= min_rel * mag.mean())
    t, f = np.nonzero(keep)
    return np.stack([t, f], axis=1).astype(np.int64)


def fingerprint_from_samples(samples: np.ndarray,
                             fan_out: int = 5,
                             max_dt: int = 63) -> list[tuple[int, int]]:
    """Landmark hashes of one clip: each peak anchors pairs with the
    next ``fan_out`` peaks within ``max_dt`` frames; hash packs
    (f_anchor:9 | f_target:9 | dt:6) — 24 bits, stored signed int64.
    Returns [(hash, t_anchor_frames)]."""
    pts = _peaks(_stft_mag(samples))
    order = np.lexsort((pts[:, 1], pts[:, 0]))   # time-major, freq tie
    pts = pts[order]
    out = []
    n = len(pts)
    for i in range(n):
        t1, f1 = int(pts[i, 0]), int(pts[i, 1])
        made = 0
        for j in range(i + 1, n):
            dt = int(pts[j, 0]) - t1
            if dt <= 0:
                continue
            if dt > max_dt:
                break
            f2 = int(pts[j, 1])
            out.append(((f1 << 15) | (f2 << 6) | dt, t1))
            made += 1
            if made >= fan_out:
                break
    return out


def fingerprint_audio(f: Frame, id_col: str = "id",
                      payload_col: str = "payload",
                      fan_out: int = 5, strict: bool = False) -> Frame:
    """Distributed landmarking: decode each WAV payload
    (codecs.decode_wav — real RIFF/WAVE PCM) and emit one row per
    landmark ``(id, fp, t)`` from a single mapInPandas Arrow pass.
    Malformed payloads contribute zero rows unless ``strict``.
    Scale shape: pure map, zero shuffles; output is ~20 bytes per
    landmark (tens per second of audio), never sample data. The
    output ``id`` field inherits the INPUT id column's type (r14
    advice) — string/UUID clip ids work, at their own width."""
    import pandas as pd
    from pyspark.sql import types as T
    in_sdf = f.sdf if hasattr(f, "sdf") else f
    schema = T.StructType([
        T.StructField("id", in_sdf.schema[id_col].dataType),
        T.StructField("fp", T.LongType()),
        T.StructField("t", T.IntegerType()),
    ])

    def kernel(batches):
        from .codecs import WavError, decode_wav
        for pdf in batches:
            ids, fps, ts = [], [], []
            for pid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, _rate = decode_wav(bytes(payload))
                except (WavError, ValueError):
                    if strict:
                        raise
                    continue
                for h, t in fingerprint_from_samples(samples, fan_out):
                    ids.append(pid)
                    fps.append(h)
                    ts.append(t)
            yield pd.DataFrame({"id": ids, "fp": fps, "t": ts})

    return Frame(in_sdf.mapInPandas(kernel, schema=schema))


def match_audio(queries: Frame, index: Frame, min_votes: int = 5,
                id_col: str = "id") -> Frame:
    """Which indexed clip does each query excerpt come from, and at
    what frame offset? Equi-join query landmarks against index
    landmarks on the 24-bit hash, bin by (query, clip,
    offset = t_index − t_query), count votes, keep each query's
    top-voted bin (votes ≥ ``min_votes``; ties break clip-then-offset
    ascending, so the verdict is deterministic). Returns
    ``(query_id, match_id, offset, votes)``.

    Scale shape: ONE hash-keyed shuffle of int landmark rows + a
    map-side-combinable vote count; the final per-query top-1 is a
    window over vote bins (bounded: queries × matched clips), not
    audio. A 100 TB index joins by 24-bit keys — skew only appears on
    landmark hashes shared by everything, which the peak floor
    already suppresses."""
    from pyspark.sql.window import Window as W
    q = (queries.sdf if hasattr(queries, "sdf") else queries) \
        .select(F.col(id_col).alias("query_id"),
                F.col("fp"), F.col("t").alias("_tq"))
    ix = (index.sdf if hasattr(index, "sdf") else index) \
        .select(F.col(id_col).alias("match_id"),
                F.col("fp"), F.col("t").alias("_ti"))
    votes = (q.join(ix, on="fp")
             .groupBy("query_id", "match_id",
                      (F.col("_ti") - F.col("_tq")).alias("offset"))
             .agg(F.count(F.lit(1)).alias("votes"))
             .filter(F.col("votes") >= min_votes))
    rk = F.row_number().over(
        W.partitionBy("query_id")
        .orderBy(F.col("votes").desc(), F.col("match_id"),
                 F.col("offset")))
    return Frame(votes.withColumn("_rk", rk).filter(F.col("_rk") == 1)
                 .select("query_id", "match_id", "offset", "votes"))
