"""Perceptual image hashing + Hamming-banded near-duplicate detection.

The image-side twin of the text dedup family: pHash (low-frequency 2-D
DCT sign hash — the pHash.org / Zauner 2010 construction) and dHash
(horizontal-gradient hash — Krawetz 2013) condense a decoded image to
64 bits such that visually-near images land within a small Hamming
distance, then :func:`image_near_dups` finds all pairs within
``max_hamming`` WITHOUT an all-pairs comparison by banding the hash —
the exact pigeonhole trick the text side's SimHash dedup uses
(pipeline.dedup, Manku 2007): a pair differing in at most ``t`` bits
across ``b > t`` disjoint bands must agree on at least one full band,
so an equi-join on (band_index, band_value) has perfect recall at the
declared radius and collision cost only at verify.

Everything here is deterministic pure numpy over the repo's own codec
layer (no image libraries in the container — pipeline.codecs decodes
BMP/PPM/PNG/GIF/JPEG/TIFF/WebP for real): nearest-neighbor resize,
orthonormal DCT-II by matrix product, exact element median (odd count).

The reference engine has no image operators; this module extends the
multimodal plumbing the build plan calls for (SURVEY.md §2 stretch:
image near-dup as a first-class training-data op).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ..frame import Frame

_MASK64 = (1 << 64) - 1


def _luma(arr: np.ndarray) -> np.ndarray:
    """H×W(×C) uint8 → H×W float64 luma (Rec. 601 weights — the same
    constants codecs.image_features uses, alpha ignored)."""
    if arr.ndim == 2:
        return arr.astype(np.float64)
    rgb = arr[..., :3].astype(np.float64)
    if rgb.shape[-1] == 1:
        return rgb[..., 0]
    return rgb @ np.array([0.299, 0.587, 0.114])


_DCT_CACHE: dict[int, np.ndarray] = {}


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (type-II, norm='ortho'):
    ``D @ x`` transforms columns; ``D @ img @ D.T`` is the 2-D DCT."""
    if n not in _DCT_CACHE:
        k = np.arange(n, dtype=np.float64)
        m = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None]
                   / (2.0 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT_CACHE[n] = m
    return _DCT_CACHE[n]


def _bits_to_i64(bits: np.ndarray) -> int:
    """Pack a ≤64-long boolean vector (MSB first) into SIGNED int64 via
    two's-complement wrap, so the value rides a Spark LongType column."""
    val = 0
    for b in bits.ravel():
        val = (val << 1) | int(bool(b))
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def phash_from_array(arr: np.ndarray, hash_size: int = 8,
                     highfreq_factor: int = 4) -> int:
    """64-bit perceptual hash of a decoded image: luma → NN-resize to
    (hash_size·highfreq_factor)² → 2-D DCT-II → keep the top-left
    ``hash_size``² low-frequency block → each bit is coeff > median of
    the block EXCLUDING the DC term (63 values, odd count → the median
    is an exact element, so the threshold is engine-exact). Robust to
    resizing/recompression/small edits; flips few bits under them."""
    from .codecs import resize_nearest
    if hash_size * hash_size > 64:
        raise ValueError(f"phash: hash_size {hash_size} exceeds 64 bits")
    n = hash_size * highfreq_factor
    g = resize_nearest(_luma(arr), n, n)
    m = _dct_matrix(n)
    d = m @ g @ m.T
    flat = d[:hash_size, :hash_size].ravel()
    med = float(np.median(flat[1:]))
    return _bits_to_i64(flat > med)


def dhash_from_array(arr: np.ndarray, hash_size: int = 8) -> int:
    """64-bit difference hash: luma → NN-resize to
    (hash_size+1)×hash_size → bit = left pixel < right pixel. Cheaper
    than pHash (no transform) and strong against uniform brightness
    shifts; weaker against crops."""
    from .codecs import resize_nearest
    if hash_size * hash_size > 64:
        raise ValueError(f"dhash: hash_size {hash_size} exceeds 64 bits")
    g = resize_nearest(_luma(arr), hash_size + 1, hash_size)
    return _bits_to_i64(g[:, :-1] < g[:, 1:])


def hamming64(a: int, b: int) -> int:
    """Bit distance between two signed-int64 hashes (driver helper;
    the distributed path uses Spark's ``bit_count(xor)``)."""
    return int(bin((a ^ b) & _MASK64).count("1"))


def _validate_bands(n_bands: int, max_hamming: int, fn: str) -> None:
    """The pigeonhole recall contract every banded consumer shares
    (one definition — image_near_dups, match_video_near, and the
    streaming image sink all split hashes the same way)."""
    if n_bands <= max_hamming:
        raise ValueError(
            f"{fn}: n_bands ({n_bands}) must exceed max_hamming "
            f"({max_hamming}) for the pigeonhole recall guarantee")
    if 64 % n_bands:
        raise ValueError(f"{fn}: n_bands ({n_bands}) must divide 64")


def hamming_bands(col, n_bands: int):
    """Array of ``n_bands`` disjoint band values of a 64-bit hash
    column — the shared split behind every Hamming-banded equi-join
    here (pigeonhole: two hashes within ``t < n_bands`` bits agree on
    at least one full band)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    c = F.col(col) if isinstance(col, str) else col
    return F.array(*[
        F.shiftrightunsigned(c, i * width).bitwiseAND(F.lit(mask))
        for i in range(n_bands)])


def hash_images(f: Frame, id_col: str = "id",
                payload_col: str = "payload", method: str = "phash",
                hash_size: int = 8, strict: bool = False) -> Frame:
    """Distributed perceptual hashing: decode each binary payload with
    the REAL codec layer (magic-sniffed BMP/PPM/PNG/GIF/JPEG/TIFF/WebP
    — same dispatch as multimodal.decode_images) inside one
    mapInPandas Arrow pass and emit ``(id, phash, width, height)``.

    Error containment matches decode_images: a malformed payload
    degrades to geometry 0×0 with a hash derived from the payload's
    md5 (deterministic, and effectively never within banding distance
    of a real image hash) unless ``strict=True``. Scale shape: pure
    map — zero shuffles; hashing 100 TB of images is embarrassingly
    parallel and the output is ~28 bytes/row (long ids; a string/UUID
    id column is carried through at its own width — the output ``id``
    field inherits the INPUT id column's type, r14 advice)."""
    import pandas as pd
    from pyspark.sql import types as T

    if method not in ("phash", "dhash"):
        raise ValueError(f"hash_images: unknown method {method!r}")
    fn = phash_from_array if method == "phash" else dhash_from_array
    in_sdf = f.sdf if hasattr(f, "sdf") else f
    schema = T.StructType([
        T.StructField("id", in_sdf.schema[id_col].dataType),
        T.StructField("phash", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])

    def kernel(batches):
        import hashlib
        from .multimodal import _sniff
        from .codecs import (BmpError, GifError, JpegError, PngError,
                             PpmError, TiffError, decode_bmp, decode_gif,
                             decode_jpeg, decode_png, decode_ppm,
                             decode_tiff)
        from .webp import WebpError, decode_webp
        real = {"bmp": decode_bmp, "ppm": decode_ppm, "png": decode_png,
                "gif": decode_gif, "jpeg": decode_jpeg,
                "tiff": decode_tiff, "webp": decode_webp}
        errs = (BmpError, PpmError, PngError, GifError, JpegError,
                TiffError, WebpError)
        for pdf in batches:
            ids, hs, ws, hts = [], [], [], []
            for pid, payload in zip(pdf[id_col], pdf[payload_col]):
                kind = _sniff(payload)
                arr = None
                if kind in real:
                    try:
                        arr = real[kind](bytes(payload))
                    except errs:
                        if strict:
                            raise
                if arr is None:
                    if strict:
                        raise ValueError(
                            f"hash_images: undecodable payload id={pid}")
                    dig = hashlib.md5(bytes(payload)).digest()
                    v = int.from_bytes(dig[:8], "big")
                    hs.append(v - (1 << 64) if v >= 1 << 63 else v)
                    ws.append(0)
                    hts.append(0)
                else:
                    hs.append(fn(arr, hash_size))
                    ws.append(arr.shape[1])
                    hts.append(arr.shape[0])
                ids.append(pid)
            yield pd.DataFrame({"id": ids, "phash": hs,
                                "width": ws, "height": hts})

    return Frame(in_sdf.mapInPandas(kernel, schema=schema))


def image_near_dups(hashes: Frame, id_col: str = "id",
                    hash_col: str = "phash", max_hamming: int = 3,
                    n_bands: int = 4) -> Frame:
    """All image pairs within ``max_hamming`` bits — exactly, without
    an all-pairs join: the 64-bit hash splits into ``n_bands`` disjoint
    bands; pairs share ≥1 full band whenever they differ in fewer than
    ``n_bands`` bits total (pigeonhole), so with ``n_bands >
    max_hamming`` the (band_index, band_value) equi-join has PERFECT
    recall at the radius and every candidate is verified with
    ``bit_count(a XOR b)`` — hash collisions cost join width only,
    never correctness. Returns ``(id_a, id_b, hamming)``, id_a < id_b.

    Scale shape: band explode (×n_bands rows, 20 bytes each), ONE
    equi-join shuffle keyed on (band, value) — the SimHash/LSH
    discipline: at 100 TB the shuffle carries fixed-width band keys,
    never pixels, and skew only appears if billions of images share a
    band value, i.e. they really are near-identical."""
    _validate_bands(n_bands, max_hamming, "image_near_dups")
    h = F.col(hash_col)
    t = (hashes.sdf if hasattr(hashes, "sdf") else hashes).select(
        F.col(id_col), h.alias("_h"),
        F.posexplode(hamming_bands(h, n_bands)).alias("_band", "_v"))
    a, b = t.alias("a"), t.alias("b")
    pairs = (a.join(b, on=["_band", "_v"])
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a._h").alias("_ha"),
                     F.col("b._h").alias("_hb"))
             .dropDuplicates(["id_a", "id_b"])
             .withColumn("hamming",
                         F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))))
             .filter(F.col("hamming") <= max_hamming)
             .select("id_a", "id_b", "hamming"))
    return Frame(pairs)


_FRAME_KEY = 1 << 24  # frame_idx packs below; clip id above


def fingerprint_video(f: Frame, id_col: str = "id",
                      payload_col: str = "payload", every_n: int = 2,
                      method: str = "phash") -> Frame:
    """Per-frame perceptual fingerprints of video payloads:
    ``(id, frame_idx, phash)`` — :func:`~crysda_spark.pipeline
    .multimodal.sample_frames` (real AVI / animated-WebP decode, BMP
    frame payloads, ORIGINAL frame indices) composed with
    :func:`hash_images`, the video analog of the audio landmark table.
    Two zero-shuffle Arrow passes; output is 20 bytes per sampled
    frame. Frame indices must stay below 2²⁴ (≈77 h at 60 fps) —
    guarded — because (id, frame_idx) rides one packed int64 through
    the fixed hashing schema."""
    from pyspark.sql import types as T
    in_dt = (f.sdf if hasattr(f, "sdf") else f).schema[id_col].dataType
    if not isinstance(in_dt, (T.ByteType, T.ShortType, T.IntegerType,
                              T.LongType)):
        raise ValueError(
            f"fingerprint_video: id_col {id_col!r} must be integral "
            f"(got {in_dt.simpleString()}) — (id, frame_idx) rides one "
            "packed int64; map string/UUID clip ids to a surrogate "
            "long first (e.g. add_row_number)")
    from .multimodal import sample_frames
    frames = sample_frames(f, every_n=every_n, id_col=id_col,
                           payload_col=payload_col)
    # the overflow guard lives INSIDE the packing expression (a CASE,
    # not a second branch), so an over-long clip fails the job loudly
    # without re-running the frame-sampling pass
    pack = F.when(
        F.col("frame_idx") >= _FRAME_KEY,
        F.raise_error(F.concat(
            F.lit("fingerprint_video: frame_idx overflows the packed "
                  "key for id "), F.col("id").cast("string")))
        .cast("long"),
    ).otherwise(F.col("id") * _FRAME_KEY + F.col("frame_idx"))
    packed = frames.sdf.select(pack.alias("id"), "payload")
    hashed = hash_images(Frame(packed), "id", "payload", method=method)
    out = hashed.sdf.select(
        F.floor(F.col("id") / _FRAME_KEY).cast("long").alias(id_col),
        (F.col("id") % _FRAME_KEY).cast("int").alias("frame_idx"),
        "phash")
    return Frame(out)


def match_video(queries: Frame, index: Frame, min_votes: int = 3,
                id_col: str = "id") -> Frame:
    """Which indexed clip does each query video come from, and at what
    frame offset? The audio matcher's discipline on frame hashes:
    equi-join on the EXACT perceptual hash (robust to container
    re-encode through the lossless codecs and to NN resize; for
    near-transcode tolerance run :func:`image_near_dups` banding on
    the frame table instead), bin by (query, clip,
    offset = frame_idx_index − frame_idx_query), count votes, keep the
    top-voted bin per query (≥ ``min_votes``, deterministic
    tie-breaks). Returns ``(query_id, match_id, offset, votes)``.
    ONE hash-keyed shuffle of int rows + a map-side-combinable count —
    identical 100 TB story to :func:`~crysda_spark.pipeline.audiofp
    .match_audio`."""
    from pyspark.sql.window import Window as W
    q = (queries.sdf if hasattr(queries, "sdf") else queries).select(
        F.col(id_col).alias("query_id"), F.col("phash"),
        F.col("frame_idx").alias("_fq"))
    ix = (index.sdf if hasattr(index, "sdf") else index).select(
        F.col(id_col).alias("match_id"), F.col("phash"),
        F.col("frame_idx").alias("_fi"))
    votes = (q.join(ix, on="phash")
             .groupBy("query_id", "match_id",
                      (F.col("_fi") - F.col("_fq")).alias("offset"))
             .agg(F.count(F.lit(1)).alias("votes"))
             .filter(F.col("votes") >= min_votes))
    rk = F.row_number().over(
        W.partitionBy("query_id")
        .orderBy(F.col("votes").desc(), F.col("match_id"),
                 F.col("offset")))
    return Frame(votes.withColumn("_rk", rk).filter(F.col("_rk") == 1)
                 .select("query_id", "match_id", "offset", "votes"))


def match_video_near(queries: Frame, index: Frame,
                     max_hamming: int = 6, n_bands: int = 8,
                     min_votes: int = 3, id_col: str = "id") -> Frame:
    """NEAR-TRANSCODE video matching (r14 — the hook documented on
    :func:`match_video`): when the query clip was re-encoded lossily
    (pixel noise, mild recompression), its frame hashes drift a few
    bits and the exact equi-join goes blind. This variant runs the
    :func:`image_near_dups` Hamming banding BETWEEN the query and
    index frame tables — the 64-bit hash splits into ``n_bands``
    disjoint bands, a query/index frame pair within ``max_hamming``
    bits shares ≥1 full band (pigeonhole: ``n_bands > max_hamming``,
    perfect recall at the radius), every band candidate is verified
    with ``bit_count(xor)`` — then bins by (query, clip, frame
    offset) and keeps the top-voted bin per query (≥ ``min_votes``,
    deterministic tie-breaks). Returns
    ``(query_id, match_id, offset, votes)``.

    Scale shape: band explode on BOTH frame tables (×``n_bands``
    fixed-width rows), ONE (band, value) equi-join shuffle — band
    keys, never pixels — a candidate-sized Hamming verify, and the
    same map-side-combinable vote as the exact matcher. Collisions
    cost join width only; a frame pair beyond the radius can vote
    only if it truly shares a band AND passes the bit_count filter,
    which the radius guarantees it cannot."""
    from pyspark.sql.window import Window as W
    _validate_bands(n_bands, max_hamming, "match_video_near")
    q = (queries.sdf if hasattr(queries, "sdf") else queries).select(
        F.col(id_col).alias("query_id"), F.col("phash").alias("_hq"),
        F.col("frame_idx").alias("_fq"),
        F.posexplode(hamming_bands("phash", n_bands)).alias("_band", "_v"))
    ix = (index.sdf if hasattr(index, "sdf") else index).select(
        F.col(id_col).alias("match_id"), F.col("phash").alias("_hi"),
        F.col("frame_idx").alias("_fi"),
        F.posexplode(hamming_bands("phash", n_bands)).alias("_band", "_v"))
    cand = (q.join(ix, on=["_band", "_v"])
            .dropDuplicates(["query_id", "_fq", "match_id", "_fi"])
            .withColumn("_ham", F.bit_count(
                F.col("_hq").bitwiseXOR(F.col("_hi"))))
            .filter(F.col("_ham") <= max_hamming))
    votes = (cand.groupBy("query_id", "match_id",
                          (F.col("_fi") - F.col("_fq")).alias("offset"))
             .agg(F.count(F.lit(1)).alias("votes"))
             .filter(F.col("votes") >= min_votes))
    rk = F.row_number().over(
        W.partitionBy("query_id")
        .orderBy(F.col("votes").desc(), F.col("match_id"),
                 F.col("offset")))
    return Frame(votes.withColumn("_rk", rk).filter(F.col("_rk") == 1)
                 .select("query_id", "match_id", "offset", "votes"))
