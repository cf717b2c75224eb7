"""VP8 (lossy WebP) intra codec: golden cross-validation against the
system libwebp when present (ctypes, test-only — the production codec
is pure Python + numpy), self-contained encoder/decoder roundtrips,
and containment-relevant error paths."""

import ctypes
import struct

import numpy as np
import pytest

from crysda_spark.pipeline.vp8 import (Vp8Error, decode_vp8,
                                       decode_vp8_yuv, encode_vp8)
from crysda_spark.pipeline.webp import WebpError, decode_webp


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:  # pragma: no cover - lib-less environments
        return None
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


LIB = _libwebp()
needs_lib = pytest.mark.skipif(LIB is None, reason="system libwebp absent")


def _lib_encode(rgba, quality):
    h, w = rgba.shape[:2]
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LIB.WebPEncodeRGBA(rgba.tobytes(), w, h, w * 4,
                           ctypes.c_float(quality), ctypes.byref(out))
    assert n > 0
    return bytes(bytearray(out[:n]))


def _lib_decode_yuv(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    yp = LIB.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yp, "libwebp rejected the stream"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    CH, CW = (H + 1) // 2, (W + 1) // 2
    Y = np.frombuffer(bytearray(yp[:S * H]), np.uint8).reshape(H, S)[:, :W]
    U = np.frombuffer(bytearray(up[:US * CH]), np.uint8).reshape(CH, US)[:, :CW]
    V = np.frombuffer(bytearray(vp[:US * CH]), np.uint8).reshape(CH, US)[:, :CW]
    return Y.copy(), U.copy(), V.copy()


def _vp8_chunk(webp):
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos:pos + 4]
        sz = struct.unpack("<I", webp[pos + 4:pos + 8])[0]
        if tag == b"VP8 ":
            return webp[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    raise AssertionError("no VP8 chunk")


def _test_image(h=48, w=80, seed=7):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[..., 0] = (xx * 3) % 256
    img[..., 1] = (yy * 5) % 256
    img[..., 2] = ((xx + yy) * 2) % 256
    img[h // 3:2 * h // 3, w // 4:w // 2, :3] = rng.integers(
        0, 256, (2 * h // 3 - h // 3, w // 2 - w // 4, 3))
    img[..., 3] = 255
    return img


# ------------------------------------------------ golden: decode parity
@needs_lib
@pytest.mark.parametrize("quality", [20.0, 75.0, 95.0])
def test_golden_decode_yuv_bitexact(quality):
    """Our decoder reproduces libwebp's Y/U/V planes bit-for-bit on
    libwebp-encoded streams (segmentation, prob updates, skip flags,
    normal loop filter all exercised at default encoder settings)."""
    img = _test_image()
    data = _lib_encode(img, quality)
    gy, gu, gv = _lib_decode_yuv(data)
    my, mu, mv = decode_vp8_yuv(_vp8_chunk(data))
    assert np.array_equal(gy, my)
    assert np.array_equal(gu, mu)
    assert np.array_equal(gv, mv)


@needs_lib
def test_golden_decode_odd_dimensions():
    img = np.ascontiguousarray(_test_image()[:37, :53])
    data = _lib_encode(img, 60.0)
    gy, gu, gv = _lib_decode_yuv(data)
    my, mu, mv = decode_vp8_yuv(_vp8_chunk(data))
    assert my.shape == (37, 53) and mu.shape == (19, 27)
    assert np.array_equal(gy, my)
    assert np.array_equal(gu, mu)
    assert np.array_equal(gv, mv)


# ------------------------------------------- golden: encode direction
@needs_lib
@pytest.mark.parametrize("q_index", [8, 40, 100])
def test_golden_libwebp_decodes_our_streams(q_index):
    """libwebp decodes OUR encoder's bitstream to the exact planes our
    decoder produces — spec conformance of the emitted stream."""
    img = _test_image(40, 56, seed=11)
    webp = encode_vp8(img, q_index=q_index)
    gy, gu, gv = _lib_decode_yuv(webp)
    my, mu, mv = decode_vp8_yuv(_vp8_chunk(webp))
    assert np.array_equal(gy, my)
    assert np.array_equal(gu, mu)
    assert np.array_equal(gv, mv)


# ------------------------------------------------- self-contained paths
def test_roundtrip_quality_ordering():
    """Lower q_index (finer quantizer) must reconstruct closer to the
    source luma; sizes must shrink as q_index grows."""
    img = _test_image(32, 48, seed=3)
    r = img[..., 0].astype(np.int32)
    g = img[..., 1].astype(np.int32)
    b = img[..., 2].astype(np.int32)
    y_src = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    errs, sizes = [], []
    for q in (8, 40, 100):
        w = encode_vp8(img, q_index=q)
        y, _, _ = decode_vp8_yuv(_vp8_chunk(w))
        errs.append(float(np.mean((y.astype(int) - y_src) ** 2)))
        sizes.append(len(w))
    assert errs[0] < errs[1] < errs[2]
    assert sizes[0] > sizes[1] > sizes[2]


def test_decode_webp_dispatches_lossy():
    img = _test_image(24, 40, seed=5)
    out = decode_webp(encode_vp8(img, q_index=12))
    assert out.shape == (24, 40, 4)
    assert float(np.abs(out[..., :3].astype(int)
                        - img[..., :3].astype(int)).mean()) < 12.0


def test_rgba_vs_yuv_consistency():
    img = _test_image(16, 16, seed=9)
    w = encode_vp8(img, q_index=20)
    rgba = decode_vp8(_vp8_chunk(w))
    y, u, v = decode_vp8_yuv(_vp8_chunk(w))
    assert rgba.shape == (16, 16, 4)
    assert y.shape == (16, 16)
    assert np.all(rgba[..., 3] == 255)


def test_deterministic():
    img = _test_image(32, 32, seed=1)
    assert encode_vp8(img, 30) == encode_vp8(img, 30)


# --------------------------------------------------- containment paths
def test_inter_frame_raises():
    img = _test_image(16, 16)
    chunk = bytearray(_vp8_chunk(encode_vp8(img, 30)))
    chunk[0] |= 1                                 # flip to inter frame
    with pytest.raises(Vp8Error, match="inter frame"):
        decode_vp8_yuv(bytes(chunk))


def test_malformed_raises_typed():
    img = _test_image(16, 16)
    good = _vp8_chunk(encode_vp8(img, 30))
    for bad in (b"", good[:5], good[:9],
                good[:3] + b"\x00\x00\x00" + good[6:],   # start code
                b"\xff" * 32):
        with pytest.raises(Vp8Error):
            decode_vp8_yuv(bad)


def test_max_pixels_guard():
    img = _test_image(16, 16)
    chunk = _vp8_chunk(encode_vp8(img, 30))
    with pytest.raises(Vp8Error, match="max_pixels"):
        decode_vp8_yuv(chunk, max_pixels=100)


def test_mutation_fuzz_raises_cleanly():
    """Single-bit corruptions beyond the dimension words must either
    decode (don't-care bit) or raise Vp8Error/WebpError — never an
    unguarded IndexError/hang. This is the per-row containment
    contract the multimodal wrapper relies on."""
    import random
    img = _test_image(16, 32, seed=13)
    base = bytearray(encode_vp8(img, q_index=30))
    rnd = random.Random(13)
    for _ in range(120):
        data = bytearray(base)
        pos = rnd.randrange(30, len(data))   # keep container + dims words
        data[pos] ^= 1 << rnd.randrange(8)
        try:
            out = decode_webp(bytes(data))
            assert out.ndim == 3
        except (WebpError, Vp8Error):
            pass
