"""VP8L (lossless WebP) codec: self-roundtrips over the full feature
matrix, golden cross-validation against the system libwebp when
present (ctypes, test-only — the production codec is pure stdlib),
and containment-relevant error paths."""

import ctypes

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crysda_spark.pipeline.webp import (WebpError, decode_webp,
                                        encode_webp)


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:  # pragma: no cover - lib-less environments
        return None
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p)]
    return lib


LIB = _libwebp()


def _lib_decode(data):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp rejected the stream"
    arr = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    LIB.WebPFree(p)
    return arr


def _lib_encode(arr):
    h, w, c = arr.shape
    a4 = arr if c == 4 else np.dstack(
        [arr, np.full((h, w), 255, np.uint8)])
    out = ctypes.c_char_p()
    n = LIB.WebPEncodeLosslessRGBA(a4.tobytes(), w, h, w * 4,
                                   ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    LIB.WebPFree(out)
    return data


def _check_roundtrip(arr, **opts):
    data = encode_webp(arr, **opts)
    dec = decode_webp(data)
    if arr.shape[2] == 3:
        assert dec.shape == arr.shape
        assert np.array_equal(dec, arr)
    else:
        assert np.array_equal(dec, arr)
    return data


OPTS = [
    dict(),
    dict(subtract_green=True),
    dict(predictor=0), dict(predictor=1), dict(predictor=2),
    dict(predictor=3), dict(predictor=4), dict(predictor=5),
    dict(predictor=6), dict(predictor=7), dict(predictor=8),
    dict(predictor=9), dict(predictor=10), dict(predictor=11),
    dict(predictor=12), dict(predictor=13),
    dict(color_transform=(23, 251, 64)),
    dict(subtract_green=True, predictor=2),
    dict(subtract_green=True, color_transform=(3, 7, 11), predictor=1),
    dict(cache_bits=4),
    dict(rle=True),
    dict(cache_bits=6, rle=True),
]


@pytest.mark.parametrize("opts", OPTS,
                         ids=[str(i) for i in range(len(OPTS))])
def test_option_matrix_roundtrip(opts):
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (14, 19, 4), dtype=np.uint8)
    grad = np.zeros((16, 11, 3), np.uint8)
    for y in range(16):
        for x in range(11):
            grad[y, x] = (x * 20 % 256, y * 15 % 256, (x + y) * 9 % 256)
    runs = np.repeat(rng.integers(0, 256, (6, 4, 4), dtype=np.uint8),
                     6, axis=1)
    for arr in (noise, grad, runs):
        data = _check_roundtrip(arr, **opts)
        if LIB is not None:   # golden: libwebp must agree byte-for-byte
            theirs = _lib_decode(data)
            want = arr if arr.shape[2] == 4 else np.dstack(
                [arr, np.full(arr.shape[:2], 255, np.uint8)])
            assert np.array_equal(theirs, want)


def test_palette_roundtrips_with_bundling():
    rng = np.random.default_rng(7)
    for ncolors, shape in [(2, (13, 29)), (3, (20, 37)), (4, (8, 9)),
                           (16, (10, 33)), (17, (12, 21)), (200, (25, 16))]:
        pal = rng.integers(0, 256, (ncolors, 4), dtype=np.uint8)
        pal[:, 3] = 255
        # force distinct colors so the palette has exactly ncolors
        pal[:, 0] = (np.arange(ncolors) * 7) % 256
        pal[:, 1] = np.arange(ncolors) // 256
        arr = pal[rng.integers(0, ncolors, shape)]
        data = _check_roundtrip(arr, palette=True)
        if LIB is not None:
            assert np.array_equal(_lib_decode(data), arr)


def test_edge_geometries():
    rng = np.random.default_rng(9)
    for shape in [(1, 1), (1, 40), (40, 1), (2, 2), (3, 64)]:
        arr = rng.integers(0, 256, (*shape, 4), dtype=np.uint8)
        _check_roundtrip(arr)


@pytest.mark.skipif(LIB is None, reason="system libwebp not present")
def test_golden_libwebp_encodes_decode_exactly():
    """The other direction: streams produced by the REAL encoder —
    which uses predictors, cross-color, color cache, LZ77, and
    meta-prefix images at its own discretion — must decode
    bit-identically to libwebp's own decoder."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:90, 0:110]
    cases = [
        np.full((8, 8, 4), 128, np.uint8),
        rng.integers(0, 256, (16, 13, 4), dtype=np.uint8),
        rng.integers(0, 256, (120, 160, 4), dtype=np.uint8),  # meta-huffman
        np.dstack([(np.sin(xx / 9) * 100 + 120),
                   (np.cos(yy / 7) * 90 + 130),
                   ((xx + yy) / 2 % 256),
                   np.full_like(xx, 255)]).astype(np.uint8),
    ]
    pal = np.array([[255, 0, 0, 255], [0, 255, 0, 255],
                    [0, 0, 255, 255]], np.uint8)
    cases.append(pal[rng.integers(0, 3, (20, 37))])
    for arr in cases:
        data = _lib_encode(arr)
        mine = decode_webp(data)
        theirs = _lib_decode(data)
        if mine.shape[2] == 3:      # alpha-hint 0 → RGB output
            assert np.array_equal(mine, theirs[..., :3])
            assert np.all(theirs[..., 3] == 255)
        else:
            assert np.array_equal(mine, theirs)


def test_lossy_vp8_dispatches_and_malformed_raises():
    """Lossy "VP8 " chunks now route to the RFC 6386 intra decoder
    (r9, pipeline/vp8.py); a malformed lossy body must still raise the
    containable WebpError, never crash."""
    import struct
    body = b"\x00" * 20                      # zero body: bad start code
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(WebpError, match="start code"):
        decode_webp(riff)
    from crysda_spark.pipeline.vp8 import encode_vp8
    out = decode_webp(encode_vp8(np.full((8, 8, 3), 200, np.uint8), 20))
    assert out.shape == (8, 8, 4)


def test_malformed_payloads_raise_not_crash():
    good = encode_webp(np.full((5, 5, 3), 77, np.uint8))
    for bad in [b"", b"RIFF", good[:20], good[:-4],
                good.replace(b"VP8L", b"XXXX"),
                b"RIFF\x10\x00\x00\x00WEBPJUNK" + b"\x00" * 8]:
        with pytest.raises(WebpError):
            decode_webp(bad)


def test_backref_run_and_cache_paths():
    """RLE emits dist-1 backrefs (overlapping copy) and the cache run
    inserts run pixels — decode must agree with the literal encoding."""
    arr = np.zeros((9, 40, 4), np.uint8)
    arr[:, :, 3] = 255
    arr[2:5, :] = (200, 10, 30, 255)
    arr[7, ::2] = (1, 2, 3, 255)
    plain = decode_webp(encode_webp(arr))
    rle = decode_webp(encode_webp(arr, rle=True))
    cached = decode_webp(encode_webp(arr, cache_bits=5, rle=True))
    assert np.array_equal(plain, rle)
    assert np.array_equal(plain, cached)
    assert np.array_equal(plain, arr)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(1, 24), h=st.integers(1, 18),
    channels=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31),
    opt=st.sampled_from([
        dict(), dict(subtract_green=True), dict(predictor=7),
        dict(predictor=12), dict(cache_bits=3), dict(rle=True),
        dict(subtract_green=True, predictor=11),
    ]))
def test_fuzz_roundtrip(w, h, channels, seed, opt):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, channels), dtype=np.uint8)
    _check_roundtrip(arr, **opt)


def test_decode_images_dispatches_webp(spark):
    """The Arrow kernel path: webp payloads yield true geometry; a
    corrupt webp degrades to the stub row (containment)."""
    from crysda_spark import Frame
    from crysda_spark.pipeline.multimodal import decode_images
    rng = np.random.default_rng(3)
    good = encode_webp(rng.integers(0, 256, (12, 17, 3), dtype=np.uint8))
    bad = good[:30]
    sdf = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))],
        "id long, payload binary")
    out = {r.id: (r.width, r.height, r.channels)
           for r in decode_images(Frame(sdf)).sdf.collect()}
    assert out[1] == (17, 12, 3)
    assert out[2] == (0, 0, 0)


def test_mutation_fuzz_raises_cleanly():
    """Random single-byte corruptions of valid streams must either
    decode (the mutation hit a don't-care bit) or raise WebpError —
    never an unguarded IndexError/KeyError/hang. This is what the
    multimodal containment wrapper catches per-row at scale."""
    import random
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (9, 14, 4), dtype=np.uint8)
    base = bytearray(encode_webp(arr, subtract_green=True, cache_bits=4))
    rnd = random.Random(13)
    for _ in range(200):
        data = bytearray(base)
        pos = rnd.randrange(20, len(data))   # keep the RIFF head intact
        data[pos] ^= 1 << rnd.randrange(8)
        try:
            out = decode_webp(bytes(data))
            assert out.ndim == 3             # decoded: shape still sane
        except WebpError:
            pass                             # clean, containable failure


# ===================================================== animation (VP8X/ANMF)
def _rng_rgba(rng, h, w, alpha=None):
    a = rng.integers(0, 256, (h, w, 4), dtype=np.int64).astype(np.uint8)
    if alpha is not None:
        a[..., 3] = alpha
    return a


def test_anim_roundtrip_compositing_matrix():
    """Mux → demux round-trip across the dispose × blend matrix; the
    expected canvases are composited independently here with the same
    documented integer-blend contract."""
    from crysda_spark.pipeline.webp import (decode_webp_anim,
                                            encode_webp_anim)
    rng = np.random.default_rng(7)
    cw, ch = 20, 14
    f0 = _rng_rgba(rng, 14, 20, alpha=255)          # full, opaque
    f1 = _rng_rgba(rng, 6, 8, alpha=128)            # blended patch
    f2 = _rng_rgba(rng, 4, 6)                       # no-blend overwrite
    f3 = _rng_rgba(rng, 5, 10, alpha=200)           # after dispose
    spec = [(f0, 0, 0, 40, False, True),
            (f1, 4, 2, 50, True, True),             # dispose its rect
            (f2, 10, 6, 60, False, False),
            (f3, 2, 8, 70, False, True)]
    data = encode_webp_anim(spec, cw, ch, loop=3, bg=(1, 2, 3, 4))
    frames, loop, bg = decode_webp_anim(data)
    assert loop == 3 and bg == (1, 2, 3, 4)
    assert [d for d, _ in frames] == [40, 50, 60, 70]

    def blend_px(dst, src):
        sa, da = int(src[3]), int(dst[3])
        da_part = da * (255 - sa)
        a_num = sa * 255 + da_part
        out = np.zeros(4, np.uint8)
        out[3] = (a_num + 127) // 255
        for c in range(3):
            num = int(src[c]) * sa * 255 + int(dst[c]) * da_part
            out[c] = (num + a_num // 2) // a_num if a_num > 0 else 0
        return out

    canvas = np.zeros((ch, cw, 4), np.uint8)
    expect = []
    pending = None
    for arr, x, y, dur, dispose, blend in spec:
        if pending:
            px, py, pw, ph = pending
            canvas[py:py + ph, px:px + pw] = 0
        h, w = arr.shape[:2]
        if blend:
            for i in range(h):
                for j in range(w):
                    canvas[y + i, x + j] = blend_px(canvas[y + i, x + j],
                                                    arr[i, j])
        else:
            canvas[y:y + h, x:x + w] = arr
        expect.append(canvas.copy())
        pending = (x, y, w, h) if dispose else None
    for (d, got), want in zip(frames, expect):
        assert np.array_equal(got, want)


def test_anim_frames_cross_validated_by_libwebp():
    """Each ANMF frame image is an independently-coded WebP: wrap every
    frame payload back into a plain RIFF and libwebp must decode it to
    exactly the frame we encoded (codec-level golden; compositing is
    container-level on top)."""
    if LIB is None:
        pytest.skip("libwebp not available")
    import struct as _struct

    from crysda_spark.pipeline.webp import _iter_chunks, encode_webp_anim
    rng = np.random.default_rng(11)
    fr = [(_rng_rgba(rng, 8, 10), 0, 0, 30, False, True),
          (_rng_rgba(rng, 8, 10), 2, 2, 30, False, True)]
    data = encode_webp_anim(fr, 16, 12)
    n = 0
    for tag, body in _iter_chunks(data):
        if tag != b"ANMF":
            continue
        sub = body[16:]
        riff = b"RIFF" + _struct.pack("<I", 4 + len(sub)) + b"WEBP" + sub
        got = _lib_decode(riff)
        assert np.array_equal(got, fr[n][0])
        n += 1
    assert n == 2


def test_anim_validation_and_sniff():
    from crysda_spark.pipeline.webp import (decode_webp_anim,
                                            encode_webp_anim, encode_webp,
                                            is_webp_anim)
    rng = np.random.default_rng(3)
    a = _rng_rgba(rng, 4, 4)
    data = encode_webp_anim([(a, 0, 0, 10, False, True)], 8, 8)
    assert is_webp_anim(data)
    assert not is_webp_anim(encode_webp(a))          # plain still
    assert not is_webp_anim(b"RIFF\x00\x00\x00\x00WEBP")
    with pytest.raises(WebpError, match="even"):
        encode_webp_anim([(a, 1, 0, 10, False, True)], 8, 8)
    with pytest.raises(WebpError, match="exceeds"):
        encode_webp_anim([(a, 6, 6, 10, False, True)], 8, 8)
    with pytest.raises(WebpError, match="anim flag"):
        decode_webp_anim(encode_webp(a))
