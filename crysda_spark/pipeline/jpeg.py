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
    """Decode a baseline sequential (SOF0/SOF1) or PROGRESSIVE (SOF2,
    T.81 Annex G: spectral selection + successive approximation, r8)
    JPEG — 8-bit, 1 or 3 components, sampling factors 1-2 — to an
    (H, W, 3) RGB uint8 array (grayscale replicates into 3 channels).
    Every scan accumulates Huffman-decoded coefficients into a
    per-component store; dequant + IDCT run ONCE after the last scan.
    Arithmetic coding, 12-bit, lossless, and hierarchical modes raise
    JpegError."""
    if payload is None or len(payload) < 4 or bytes(payload[:2]) != b"\xFF\xD8":
        raise JpegError("missing SOI marker")
    data = bytes(payload)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    coeff: list[np.ndarray] = []
    restart_interval = 0
    scanned = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}, got 0x{data[pos]:02x}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:  # EOI
            if not scanned:
                raise JpegError("EOI before SOS")
            break
        if pos + 2 > len(data):
            raise JpegError(f"truncated segment 0x{marker:02x}")
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if frame is not None:
                raise JpegError("multiple SOF markers")
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
            frame = _frame_geom(h, w, comps, progressive=(marker == 0xC2))
            coeff = [np.zeros((frame["mcuy"] * vs, frame["mcux"] * hs, 64),
                              np.int32)
                     for _, hs, vs, _ in comps]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported SOF 0x{marker:02x} "
                "(baseline sequential / progressive only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            pos = _decode_scan(data, pos + seglen, frame, seg, coeff,
                               huff_dc, huff_ac, restart_interval)
            scanned = True
            continue
        pos += seglen  # APPn / COM / others: skip
    if frame is None or not scanned:
        raise JpegError("no SOS marker found")
    return _reconstruct(frame, coeff, qt)


def _frame_geom(h: int, w: int, comps, progressive: bool) -> dict:
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    geom = dict(
        h=h, w=w, comps=comps, hmax=hmax, vmax=vmax,
        mcux=(w + 8 * hmax - 1) // (8 * hmax),
        mcuy=(h + 8 * vmax - 1) // (8 * vmax),
        progressive=progressive,
        # per-component ACTUAL block grid (non-interleaved scans cover
        # exactly these, never the MCU padding — T.81 A.2.2)
        bw=[((w * hs + hmax - 1) // hmax + 7) // 8 for _, hs, _, _ in comps],
        bh=[((h * vs + vmax - 1) // vmax + 7) // 8 for _, _, vs, _ in comps])
    return geom


def _decode_scan(data, pos, frame, seg, coeff, huff_dc, huff_ac,
                 restart_interval) -> int:
    """Decode one scan's entropy data into the coefficient store;
    returns the position of the next marker. Handles all four
    progressive scan types (DC/AC × first/refinement) plus full-band
    sequential scans through the same MCU walk."""
    comps = frame["comps"]
    ns = seg[0]
    if not 1 <= ns <= len(comps):
        raise JpegError(f"bad SOS component count {ns}")
    scan: list[tuple[int, int, int]] = []  # (comp_index, td, ta)
    for i in range(ns):
        cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        ci = next((j for j, c in enumerate(comps) if c[0] == cs), None)
        if ci is None:
            raise JpegError(f"SOS references unknown component {cs}")
        scan.append((ci, tt >> 4, tt & 0x0F))
    ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    if frame["progressive"]:
        if ss == 0 and se != 0:
            raise JpegError("progressive DC scan must have Se=0")
        if ss > 0 and ns != 1:
            raise JpegError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise JpegError(f"bad spectral band {ss}..{se}")
    else:
        ss, se, ah, al = 0, 63, 0, 0  # sequential: full band, no approx
    dc_needed = ss == 0
    ac_needed = se > 0
    tbl_dc, tbl_ac = {}, {}
    for ci, td, ta in scan:
        if dc_needed and ah == 0:
            if td not in huff_dc:
                raise JpegError(f"missing Huffman table DC{td}")
            tbl_dc[ci] = huff_dc[td]
        if ac_needed:
            if ta not in huff_ac:
                raise JpegError(f"missing Huffman table AC{ta}")
            tbl_ac[ci] = huff_ac[ta]

    # MCU walk: interleaved scans use the MCU grid; single-component
    # scans walk the component's own block grid in raster order.
    if ns > 1:
        units = []
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                blocks = []
                for ci, _, _ in scan:
                    _, hs, vs, _ = comps[ci]
                    blocks.extend((ci, my * vs + by, mx * hs + bx)
                                  for by in range(vs) for bx in range(hs))
                units.append(blocks)
    else:
        ci = scan[0][0]
        units = [[(ci, by, bx)]
                 for by in range(frame["bh"][ci])
                 for bx in range(frame["bw"][ci])]

    reader = _BitReader(data, pos)
    pred = {ci: 0 for ci, _, _ in scan}
    eobrun = 0
    rst_k = 0
    for n_mcu, blocks in enumerate(units):
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            reader.sync_restart(rst_k)
            rst_k = (rst_k + 1) & 7
            pred = {ci: 0 for ci, _, _ in scan}
            eobrun = 0
        for ci, by, bx in blocks:
            blk = coeff[ci][by, bx]
            if not frame["progressive"]:
                _seq_block(reader, blk, tbl_dc[ci], tbl_ac[ci], pred, ci)
            elif ss == 0 and ah == 0:
                s = _decode_huff(reader, tbl_dc[ci])
                if s > 11:
                    raise JpegError(f"bad DC magnitude {s}")
                diff = _extend(reader.read_bits(s), s) if s else 0
                pred[ci] += diff
                blk[0] = pred[ci] << al
            elif ss == 0:  # DC refinement: one bit per block
                if reader.read_bit():
                    blk[0] = int(blk[0]) | (1 << al)
            elif ah == 0:
                eobrun = _ac_first_block(reader, blk, tbl_ac[ci],
                                         ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, blk, tbl_ac[ci],
                                          ss, se, al, eobrun)
    # advance to the next marker (skip stuffed 0xFF00 and RSTn)
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 \
                and not 0xD0 <= data[p + 1] <= 0xD7:
            return p
        p += 1
    raise JpegError("scan data ran past end of payload")


def _seq_block(reader, blk, dc_tbl, ac_tbl, pred, ci) -> None:
    s = _decode_huff(reader, dc_tbl)
    if s > 11:
        raise JpegError(f"bad DC magnitude {s}")
    diff = _extend(reader.read_bits(s), s) if s else 0
    pred[ci] += diff
    blk[0] = pred[ci]
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
        blk[k] = _extend(reader.read_bits(size), size)
        k += 1


def _ac_first_block(reader, blk, ac_tbl, ss, se, al, eobrun) -> int:
    """Progressive AC first scan for one block (T.81 G.1.2.2): band
    coefficients at point transform ``al``, with EOBn run-length codes
    spanning blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, ac_tbl)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise JpegError("AC run past spectral band end")
        blk[k] = _extend(reader.read_bits(size), size) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, blk, ac_tbl, ss, se, al, eobrun) -> int:
    """Progressive AC refinement for one block (T.81 G.1.2.3): append
    one magnitude bit to every already-nonzero band coefficient,
    insert newly-significant ±1<<al coefficients, honoring zero-run
    and EOB-run codes that count only zero-HISTORY positions."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(reader, ac_tbl)
            r, size = rs >> 4, rs & 0x0F
            val = 0
            if size == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients
            elif size == 1:
                val = p1 if reader.read_bit() else m1
            else:
                raise JpegError("refinement magnitude must be 1 bit")
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0 and reader.read_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, coeff, qt) -> np.ndarray:
    """Dequantize, inverse-DCT (vectorized over all blocks), upsample,
    and color-convert the accumulated coefficient store."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in qt:
            raise JpegError(f"component {cid} references missing DQT {tq}")
        c = coeff[ci]
        by, bx = c.shape[0], c.shape[1]
        nat = np.zeros((by, bx, 64), np.float64)
        nat[:, :, ZIGZAG] = c
        nat = nat.reshape(by, bx, 8, 8) * qt[tq]
        spatial = np.einsum("ij,abjk,kl->abil", _A.T, nat, _A) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        full.append(plane[:h, :w])
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


# Flat 8-bit AC table for progressive scans: every (run, size) symbol
# with size ≤ 10 — 176 codes of length 8 (canonical 0x00..0xAF; the
# all-ones code stays unused per T.81 C.2). Annex-K baseline tables
# lack the EOBn symbols (0x10..0xE0) progressive EOB runs need.
_PROG_AC = ([0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
            [(r << 4) | s for r in range(16) for s in range(11)])


def _emit_dc(writer, diff: int, dc_enc) -> None:
    s = int(diff).bit_length() if diff else 0
    if s > 11:
        raise JpegError("DC difference out of baseline range")
    code, length = dc_enc[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)


def _emit_seq_block(writer, zz, dc_enc, ac_enc, pred: int) -> int:
    """Emit one full-band sequential block from its zigzag-quantized
    coefficients; returns the new DC predictor."""
    _emit_dc(writer, int(zz[0]) - pred, dc_enc)
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


class _EobState:
    """EOB-run accumulator shared across a progressive AC scan's blocks
    (plus the refinement scans' buffered correction bits)."""

    __slots__ = ("run", "bits")

    def __init__(self):
        self.run = 0
        self.bits: list[int] = []

    def flush(self, writer, ac_enc) -> None:
        if self.run:
            r = self.run.bit_length() - 1
            code, length = ac_enc[r << 4]
            writer.write(code, length)
            if r:
                writer.write(self.run - (1 << r), r)
            self.run = 0
        for b in self.bits:
            writer.write(b, 1)
        self.bits = []

    def account(self, writer, ac_enc, extra_bits) -> None:
        self.run += 1
        self.bits.extend(extra_bits)
        if self.run == 0x7FFF:
            self.flush(writer, ac_enc)


def _emit_ac_first_block(writer, zz, ac_enc, ss, se, al, st: _EobState):
    """Progressive AC first scan, one block (T.81 G.1.2.2 encoder):
    magnitudes point-transformed toward zero by ``al``, EOBn runs
    spanning blocks."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        mag = (abs(v)) >> al
        if mag == 0:
            r += 1
            continue
        st.flush(writer, ac_enc)
        while r > 15:
            code, length = ac_enc[0xF0]  # ZRL
            writer.write(code, length)
            r -= 16
        s = mag.bit_length()
        code, length = ac_enc[(r << 4) | s]
        writer.write(code, length)
        writer.write(mag if v > 0 else (~mag) & ((1 << s) - 1), s)
        r = 0
    if r > 0:
        st.account(writer, ac_enc, [])


def _emit_ac_refine_block(writer, zz, ac_enc, ss, se, al, st: _EobState):
    """Progressive AC refinement, one block (T.81 G.1.2.3 encoder,
    libjpeg's buffered-correction-bit structure): newly-significant
    coefficients (|v| >> al == 1) get run+sign codes counting only
    zero-history positions; already-nonzero coefficients contribute one
    buffered magnitude bit each."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            st.flush(writer, ac_enc)
            code, length = ac_enc[0xF0]  # ZRL
            writer.write(code, length)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)  # history nonzero: one correction bit
            continue
        st.flush(writer, ac_enc)  # newly significant: run + sign
        code, length = ac_enc[(r << 4) | 1]
        writer.write(code, length)
        writer.write(1 if int(zz[k]) > 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.account(writer, ac_enc, br)


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool = False,
                quant_luma: np.ndarray | None = None,
                quant_chroma: np.ndarray | None = None,
                progressive: bool = False) -> bytes:
    """Encode an (H, W, 3) RGB uint8 array as a baseline JPEG — or a
    PROGRESSIVE (SOF2) one with ``progressive=True``: the scan script
    exercises every Annex-G scan type (interleaved DC first at Al=1,
    per-component AC first in two spectral bands at Al=1, the matching
    AC refinements at Ah=1→Al=0, and a final interleaved DC
    refinement), using a flat 8-bit AC table because the Annex-K
    baseline tables lack EOBn symbols. Both modes quantize identical
    coefficients, so progressive decode must reconstruct the same
    image bit-for-bit as baseline decode.

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

    # FDCT + quantize every block ONCE, per component, zigzag order —
    # baseline and progressive scans emit from the same coefficients.
    # (clamp to the 10-bit AC magnitude: extreme checkerboards with
    # all-ones quant can reach 11 bits — libjpeg clamps likewise)
    def qz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        by, bx = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        co = np.einsum("ij,abjk,kl->abil", _A, blocks - 128.0, _A.T)
        qn = np.clip(np.round(co / q), -1023, 1023).astype(np.int32)
        return qn.reshape(by, bx, 64)[:, :, ZIGZAG]

    zz = [qz(ypad, ql), qz(cbs, qc), qz(crs, qc)]
    samp = [(hs_y, vs_y), (1, 1), (1, 1)]
    # actual per-component block grid (non-interleaved scan coverage)
    hmax = vmax = hs_y
    bw = [((w * hs + hmax - 1) // hmax + 7) // 8 for hs, _ in samp]
    bh = [((h * vs + vmax - 1) // vmax + 7) // 8 for _, vs in samp]

    dc_l_enc, _ = _canonical_codes(*_DC_LUMA)
    dc_c_enc, _ = _canonical_codes(*_DC_CHROMA)
    dc_enc = [dc_l_enc, dc_c_enc, dc_c_enc]

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hs, vs) in enumerate(samp):
                    for by in range(vs):
                        for bx in range(hs):
                            yield ci, my * vs + by, mx * hs + bx

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq])
                   + bytes(int(v) for v in tbl.reshape(64)[ZIGZAG]))

    def dht(tc: int, th: int, table) -> bytes:
        bits, values = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    def sos(comps: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        body = bytes([len(comps)])
        for cs, td, ta in comps:
            body += bytes([cs, (td << 4) | ta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    hv_y = (hs_y << 4) | vs_y
    head = (b"\xFF\xD8"
            + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + dqt(0, ql) + dqt(1, qc))

    if not progressive:
        ac_l_enc, _ = _canonical_codes(*_AC_LUMA)
        ac_c_enc, _ = _canonical_codes(*_AC_CHROMA)
        ac_enc = [ac_l_enc, ac_c_enc, ac_c_enc]
        writer = _BitWriter()
        pred = [0, 0, 0]
        for ci, by, bx in mcu_blocks():
            pred[ci] = _emit_seq_block(writer, zz[ci][by, bx],
                                       dc_enc[ci], ac_enc[ci], pred[ci])
        writer.flush()
        sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                  + bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1]))
        return (head + sof
                + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
                + dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
                + sos([(1, 0, 0), (2, 1, 1), (3, 1, 1)], 0, 63, 0, 0)
                + bytes(writer.out) + b"\xFF\xD9")

    # progressive: SOF2 + the Annex-G scan script
    prog_ac_enc, _ = _canonical_codes(*_PROG_AC)
    out = bytearray(head)
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += (dht(0, 0, _DC_LUMA) + dht(0, 1, _DC_CHROMA)
            + dht(1, 0, _PROG_AC))
    cs_of = [1, 2, 3]
    td_of = [0, 1, 1]

    # scan 1: interleaved DC first, Al=1
    writer = _BitWriter()
    pred = [0, 0, 0]
    for ci, by, bx in mcu_blocks():
        v = int(zz[ci][by, bx][0]) >> 1
        _emit_dc(writer, v - pred[ci], dc_enc[ci])
        pred[ci] = v
    writer.flush()
    out += sos([(cs_of[c], td_of[c], 0) for c in range(3)], 0, 0, 0, 1)
    out += bytes(writer.out)

    # per component: AC first in two spectral bands at Al=1, then the
    # matching refinements at Ah=1 → Al=0
    bands = [(1, 5), (6, 63)]
    for emit, ah, al in ((_emit_ac_first_block, 0, 1),
                         (_emit_ac_refine_block, 1, 0)):
        for ci in range(3):
            for b_ss, b_se in bands:
                writer = _BitWriter()
                st = _EobState()
                for by in range(bh[ci]):
                    for bx in range(bw[ci]):
                        emit(writer, zz[ci][by, bx], prog_ac_enc,
                             b_ss, b_se, al, st)
                st.flush(writer, prog_ac_enc)
                writer.flush()
                out += sos([(cs_of[ci], 0, 0)], b_ss, b_se, ah, al)
                out += bytes(writer.out)

    # final scan: interleaved DC refinement, Ah=1 → Al=0 (bits only)
    writer = _BitWriter()
    for ci, by, bx in mcu_blocks():
        writer.write(int(zz[ci][by, bx][0]) & 1, 1)
    writer.flush()
    out += sos([(cs_of[c], 0, 0) for c in range(3)], 0, 0, 1, 0)
    out += bytes(writer.out)
    return bytes(out + b"\xFF\xD9")
