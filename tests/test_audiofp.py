"""Audio fingerprinting (pipeline.audiofp — Wang 2003 constellation
hashing): landmark determinism, driver-vs-distributed parity through
the real WAV codec, and offset-voting matching with planted excerpts."""

from __future__ import annotations

import numpy as np
import pytest

from crysda_spark import Frame
from crysda_spark.pipeline.audiofp import (HOP, fingerprint_audio,
                                           fingerprint_from_samples,
                                           match_audio)

RATE = 8000


def synth(did: int, seconds: float = 4.0) -> np.ndarray:
    """Deterministic tone-block clip: 4 sinusoids re-drawn every 0.5 s
    from RandomState(500+did) — strong, distinct spectral peaks."""
    rng = np.random.RandomState(500 + did)
    n = int(seconds * RATE)
    t = np.arange(n) / RATE
    x = np.zeros(n)
    block = RATE // 2
    for b in range(0, n, block):
        seg = slice(b, min(b + block, n))
        for fq, a in zip(rng.uniform(200, 3500, 4),
                         rng.uniform(0.5, 1.0, 4)):
            x[seg] += a * np.sin(2 * np.pi * fq * t[seg])
    return (x / np.abs(x).max()).reshape(-1, 1)


def test_fingerprints_deterministic_and_offset_votes():
    clip = synth(1)
    fps = fingerprint_from_samples(clip)
    assert len(fps) > 100
    assert fps == fingerprint_from_samples(clip.copy())
    # hashes are 24-bit non-negative ints; times are frame indices
    assert all(0 <= h < (1 << 24) and t >= 0 for h, t in fps)
    # a hop-aligned excerpt votes overwhelmingly for the true offset
    off = 32
    ex = clip[off * HOP: off * HOP + RATE * 2]
    idx: dict[int, list[int]] = {}
    for h, t in fps:
        idx.setdefault(h, []).append(t)
    from collections import Counter
    votes = Counter()
    for h, tq in fingerprint_from_samples(ex):
        for ti in idx.get(h, []):
            votes[ti - tq] += 1
    top_off, top_n = votes.most_common(1)[0]
    assert top_off == off and top_n > 50
    # and barely at all for a different clip
    idx2: dict[int, list[int]] = {}
    for h, t in fingerprint_from_samples(synth(2)):
        idx2.setdefault(h, []).append(t)
    wrong = Counter()
    for h, tq in fingerprint_from_samples(ex):
        for ti in idx2.get(h, []):
            wrong[ti - tq] += 1
    assert not wrong or wrong.most_common(1)[0][1] < 5


def test_fingerprint_audio_distributed_matches_driver(spark):
    from crysda_spark.pipeline.codecs import decode_wav, encode_wav
    clips = {i: synth(i, seconds=2.0) for i in range(3)}
    rows = [(i, bytearray(encode_wav(a, RATE))) for i, a in clips.items()]
    rows.append((99, bytearray(b"RIFFjunk")))       # malformed: 0 rows
    f = Frame(spark.createDataFrame(rows, "id long, payload binary"))
    got = fingerprint_audio(f).sdf.collect()
    by_id: dict[int, set] = {}
    for r in got:
        by_id.setdefault(r["id"], set()).add((r["fp"], r["t"]))
    for i, a in clips.items():
        # parity against the driver kernel run on the DECODED samples
        # (16-bit quantization happens before both paths)
        dec, _ = decode_wav(encode_wav(a, RATE))
        assert by_id[i] == set(fingerprint_from_samples(dec))
    assert 99 not in by_id
    with pytest.raises(Exception):
        fingerprint_audio(f, strict=True).sdf.collect()


def test_match_audio_recovers_planted_excerpts(spark):
    from crysda_spark.pipeline.codecs import encode_wav
    clips = {i: synth(i) for i in range(4)}
    off = 32
    idx_rows = [(i, bytearray(encode_wav(a, RATE)))
                for i, a in clips.items()]
    q_rows = [(i + 1000,
               bytearray(encode_wav(clips[i][off * HOP:
                                             off * HOP + RATE * 2], RATE)))
              for i in (0, 2)]
    ix = fingerprint_audio(Frame(spark.createDataFrame(
        idx_rows, "id long, payload binary")))
    qs = fingerprint_audio(Frame(spark.createDataFrame(
        q_rows, "id long, payload binary")))
    out = {r["query_id"]: r for r in match_audio(qs, ix).sdf.collect()}
    assert set(out) == {1000, 1002}
    for qid in (1000, 1002):
        assert out[qid]["match_id"] == qid - 1000
        assert out[qid]["offset"] == off
        assert out[qid]["votes"] > 50


def test_stream_match_audio_against_static_index(spark, tmp_path):
    """Streaming twin: micro-batches of clips match the pinned catalog
    landmark index; output partitions by batch id; per-batch pins are
    scoped so a concurrent pipeline's pin survives."""
    import os
    from crysda_spark.pipeline.codecs import encode_wav
    from crysda_spark.plans.cache import pin, release_pinned
    from crysda_spark.streaming.cdc import stream_match_audio

    clips = {i: synth(i) for i in range(3)}
    idx_p = str(tmp_path / "landmarks")
    fingerprint_audio(Frame(spark.createDataFrame(
        [(i, bytearray(encode_wav(a, RATE))) for i, a in clips.items()],
        "id long, payload binary"))).sdf.write.parquet(idx_p)

    src = str(tmp_path / "in")
    out = str(tmp_path / "matches")
    os.makedirs(src)
    off = 32

    def excerpt(i):
        return bytearray(encode_wav(
            clips[i][off * HOP: off * HOP + RATE * 2], RATE))

    spark.createDataFrame([(1000, excerpt(0))],
                          "id long, payload binary") \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("id long, payload binary") \
        .parquet(src)
    q = stream_match_audio(stream, idx_p, out,
                           checkpoint=str(tmp_path / "ck"))
    other = pin(spark.range(7))
    try:
        q.processAllAvailable()
        spark.createDataFrame([(1002, excerpt(2)),
                               (1003, bytearray(b"not audio"))],
                              "id long, payload binary") \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {r["query_id"]: r for r in
               spark.read.parquet(out).collect()}
        assert got[1000]["match_id"] == 0 and got[1000]["offset"] == off
        assert got[1000]["batch_id"] == 0
        assert got[1002]["match_id"] == 2 and got[1002]["batch_id"] == 1
        assert 1003 not in got            # undecodable -> no landmarks
        assert other.is_cached            # scoped per-batch releases
    finally:
        q.stop()
        release_pinned()


def test_stream_match_audio_rejects_wrong_index(spark, tmp_path):
    import os
    from crysda_spark.streaming.cdc import stream_match_audio
    bad = str(tmp_path / "bad_idx")
    spark.range(3).write.parquet(bad)
    src = str(tmp_path / "src")
    os.makedirs(src)
    stream = spark.readStream.schema("id long, payload binary") \
        .parquet(src)
    with pytest.raises(ValueError, match="landmark columns"):
        stream_match_audio(stream, bad, str(tmp_path / "o"))


def test_fingerprint_audio_string_ids(spark):
    # r14 advice twin of the hash_images fix: the landmark table's id
    # field inherits the input id column's type.
    from crysda_spark.pipeline.codecs import encode_wav
    f = Frame(spark.createDataFrame(
        [("clip-x", bytearray(encode_wav(synth(3, 2.0), RATE)))],
        "id string, payload binary"))
    out = fingerprint_audio(f).sdf.collect()
    assert len(out) > 0 and all(r["id"] == "clip-x" for r in out)
