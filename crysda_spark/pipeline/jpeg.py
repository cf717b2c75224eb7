"""Dependency-free baseline JPEG codec (pure stdlib + numpy).

Completes the real-codec set in ``pipeline.codecs`` (BMP/PPM/PNG/GIF)
with the single most common web image format. Implemented from the
public ITU-T T.81 specification:

- decoder: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
  sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0), DQT (8/16-bit), DHT
  (canonical Huffman), DRI/RSTn restart markers, 0xFF00 byte
  de-stuffing, dequant + zigzag + exact float IDCT, replicated chroma
  upsampling, BT.601 YCbCr→RGB;
- encoder: the matching subset (4:4:4 or 4:2:0, Annex-K standard
  Huffman tables, quality-scaled or caller-supplied quantization).

JPEG is lossy: the roundtrip tests bound reconstruction error with
all-ones quantization tables (error comes only from DCT float
rounding and chroma conversion) instead of demanding bit equality.

Everything here is executor-local per-payload work; distribution
(Arrow batches, mapInPandas) lives in ``multimodal.py``.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# 8x8 DCT-II basis: A[u, x] = C(u)/2 * cos((2x+1) u pi / 16).
# spatial = A.T @ coeffs @ A ; coeffs = A @ spatial @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Annex K quantization tables (luminance, chrominance), natural order
STD_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.uint16).reshape(8, 8)
STD_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.uint16).reshape(8, 8)

# Annex K Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _canonical_codes(bits: list[int], values: list[int]):
    """(symbol → (code, length)) and ((length, code) → symbol) for a
    canonical JPEG Huffman table."""
    enc, dec = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[k]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    de-stuffing; surfaces RSTn markers to the MCU loop."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegError("entropy-coded data exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise JpegError("dangling 0xFF at end of scan")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed literal 0xFF
            elif 0xD0 <= nxt <= 0xD7:
                raise JpegError("unexpected restart marker inside block")
            else:
                # real marker (e.g. EOI) — scan overran; pad with zeros
                # like hardware decoders do for truncated final bits
                self.pos -= 1
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, k: int) -> None:
        """Byte-align and consume the expected RSTk marker."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF \
                or self.data[self.pos + 1] != 0xD0 + (k & 7):
            raise JpegError(f"missing RST{k & 7} restart marker")
        self.pos += 2


def _decode_huff(reader: _BitReader, dec: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = dec.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code (no symbol within 16 bits)")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (SOF0, 8-bit, 1 or 3
    components, sampling factors 1-2) to an (H, W, 3) RGB uint8 array
    (grayscale replicates into 3 channels). Progressive (SOF2),
    arithmetic coding, 12-bit, and hierarchical modes raise JpegError."""
    if payload is None or len(payload) < 4 or bytes(payload[:2]) != b"\xFF\xD8":
        raise JpegError("missing SOI marker")
    data = bytes(payload)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps) comps = list of (cid, hsamp, vsamp, tq)
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}, got 0x{data[pos]:02x}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:  # EOI before scan
            raise JpegError("EOI before SOS")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2 or pos + seglen > len(data):
            raise JpegError(f"truncated segment 0x{marker:02x}")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if pq else 1)
                if p + n > len(seg):
                    raise JpegError("truncated DQT")
                if pq:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                else:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                nat = np.zeros(64, np.int32)
                nat[ZIGZAG] = tbl
                qt[tq] = nat.reshape(8, 8)
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if p + 16 > len(seg):
                    raise JpegError("truncated DHT")
                bits = list(seg[p:p + 16])
                p += 16
                nsym = sum(bits)
                if p + nsym > len(seg):
                    raise JpegError("truncated DHT symbols")
                values = list(seg[p:p + nsym])
                p += nsym
                _, dec = _canonical_codes(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 (baseline-compatible)
            prec, h, w, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], \
                struct.unpack_from(">H", seg, 3)[0], seg[5]
            if prec != 8:
                raise JpegError(f"unsupported precision {prec} (8-bit only)")
            if h <= 0 or w <= 0:
                raise JpegError(f"bad dimensions {w}x{h}")
            if nc not in (1, 3):
                raise JpegError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise JpegError(f"unsupported sampling {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported SOF 0x{marker:02x} (baseline sequential only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            h, w, comps = frame
            ns = seg[0]
            if ns != len(comps):
                raise JpegError("SOS component count != SOF")
            scan_tbl = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tbl[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(data, pos + seglen, h, w, comps, scan_tbl,
                                qt, huff_dc, huff_ac, restart_interval)
        # APPn / COM / others: skip
        pos += seglen
    raise JpegError("no SOS marker found")


def _decode_scan(data, pos, h, w, comps, scan_tbl, qt, huff_dc, huff_ac,
                 restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            raise JpegError(f"component {cid} references missing DQT {tq}")
        if cid not in scan_tbl:
            raise JpegError(f"SOS missing component {cid}")
        td, ta = scan_tbl[cid]
        if td not in huff_dc or ta not in huff_ac:
            raise JpegError(f"missing Huffman table DC{td}/AC{ta}")
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8), np.float64))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    rst_k = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.sync_restart(rst_k)
                rst_k = (rst_k + 1) & 7
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = scan_tbl[cid]
                dc_tbl, ac_tbl = huff_dc[td], huff_ac[ta]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coeffs = np.zeros(64, np.int32)
                        s = _decode_huff(reader, dc_tbl)
                        if s > 11:
                            raise JpegError(f"bad DC magnitude {s}")
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_tbl)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC run past block end")
                            coeffs[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[ZIGZAG] = coeffs
                        blk = blk.reshape(8, 8) * q
                        spatial = _A.T @ blk @ _A + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
    full = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.stack([y, y, y], axis=-1))
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81


def _encode_block(writer, blk, q, dc_enc, ac_enc, pred):
    coeffs = _A @ (blk - 128.0) @ _A.T
    # clamp to the baseline 10-bit AC magnitude (extreme checkerboards
    # with all-ones quant can reach 11 bits — libjpeg clamps likewise)
    quant = np.clip(np.round(coeffs / q), -1023, 1023).astype(np.int32)
    zz = quant.reshape(64)[ZIGZAG]  # natural -> zigzag order
    diff = int(zz[0]) - pred
    s = int(diff).bit_length() if diff else 0
    if s > 11:
        raise JpegError("DC difference out of baseline range")
    code, length = dc_enc[s]
    writer.write(code, length)
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        writer.write(v, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_enc[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool = False,
                quant_luma: np.ndarray | None = None,
                quant_chroma: np.ndarray | None = None) -> bytes:
    """Encode an (H, W, 3) RGB uint8 array as a baseline JPEG.
    ``subsample=True`` writes 4:2:0 (2x2-averaged chroma), else 4:4:4.
    ``quality`` scales the Annex-K tables (libjpeg convention); pass
    explicit ``quant_luma``/``quant_chroma`` (8x8, natural order) to
    override — all-ones tables give near-lossless output for the
    roundtrip tests."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise JpegError(f"encode_jpeg wants (H, W, 3), got {arr.shape}")
    if not 1 <= quality <= 100:
        raise JpegError(f"quality {quality} outside [1, 100]")
    h, w, _ = arr.shape
    if quant_luma is None or quant_chroma is None:
        scale = 5000 // quality if quality < 50 else 200 - 2 * quality
        ql = np.clip((STD_QUANT_LUMA * scale + 50) // 100, 1, 255)
        qc = np.clip((STD_QUANT_CHROMA * scale + 50) // 100, 1, 255)
        quant_luma = ql if quant_luma is None else quant_luma
        quant_chroma = qc if quant_chroma is None else quant_chroma
    ql = np.asarray(quant_luma, np.int32).reshape(8, 8)
    qc = np.asarray(quant_chroma, np.int32).reshape(8, 8)

    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
        + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
        - 0.081312 * rgb[:, :, 2]

    if subsample:
        hs_y = vs_y = 2
        mw, mh = 16, 16
    else:
        hs_y = vs_y = 1
        mw = mh = 8
    mcux, mcuy = (w + mw - 1) // mw, (h + mh - 1) // mh

    def pad(plane, ph, pw):
        out = np.empty((ph, pw), np.float64)
        out[:plane.shape[0], :plane.shape[1]] = plane
        out[plane.shape[0]:, :plane.shape[1]] = plane[-1:, :]
        out[:, plane.shape[1]:] = out[:, plane.shape[1] - 1:plane.shape[1]]
        return out

    ypad = pad(y, mcuy * mh, mcux * mw)
    if subsample:
        cbf = pad(cb, mcuy * mh, mcux * mw)
        crf = pad(cr, mcuy * mh, mcux * mw)
        cbs = cbf.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crs = crf.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbs = pad(cb, mcuy * 8, mcux * 8)
        crs = pad(cr, mcuy * 8, mcux * 8)

    dc_l_enc, _ = _canonical_codes(*_DC_LUMA)
    dc_c_enc, _ = _canonical_codes(*_DC_CHROMA)
    ac_l_enc, _ = _canonical_codes(*_AC_LUMA)
    ac_c_enc, _ = _canonical_codes(*_AC_CHROMA)

    writer = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vs_y):
                for bx in range(hs_y):
                    y0, x0 = (my * vs_y + by) * 8, (mx * hs_y + bx) * 8
                    pred[0] = _encode_block(
                        writer, ypad[y0:y0 + 8, x0:x0 + 8], ql,
                        dc_l_enc, ac_l_enc, pred[0])
            for ci, plane in ((1, cbs), (2, crs)):
                y0, x0 = my * 8, mx * 8
                pred[ci] = _encode_block(
                    writer, plane[y0:y0 + 8, x0:x0 + 8], qc,
                    dc_c_enc, ac_c_enc, pred[ci])
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq])
                   + bytes(int(v) for v in tbl.reshape(64)[ZIGZAG]))

    def dht(tc: int, th: int, table) -> bytes:
        bits, values = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    hv_y = (hs_y << 4) | vs_y
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (b"\xFF\xD8"
            + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + dqt(0, ql) + dqt(1, qc)
            + sof
            + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
            + dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
            + sos + bytes(writer.out) + b"\xFF\xD9")
