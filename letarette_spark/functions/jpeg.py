"""Pure-Python/numpy JPEG codec (ITU-T T.81), baseline AND progressive.

Implements enough of the public JPEG standard for REAL decode of
baseline (SOF0) and progressive (SOF2, huffman) JFIF files — marker
parsing, canonical Huffman tables, MCU entropy decode with byte
unstuffing and restart markers, multi-scan spectral-selection +
successive-approximation coefficient accumulation (Annex G: DC
first/refine, AC first with EOBRUN, AC refinement correction bits),
dequantize + zigzag, matrix IDCT, chroma upsampling (4:4:4 / 4:2:2 /
4:2:0), YCbCr->RGB — and matching 4:4:4 encoders (baseline and
progressive, Annex K tables) used by the tests to produce known-pixel
inputs; the two encoders emit the same quantized coefficients, so the
decoders must reconstruct byte-identical pixels (the central test).

Arithmetic-coded, 12-bit and lossless JPEG remain out of scope
(decode_jpeg returns None; multimodal falls back to its explicit
boundary). Throughput note: the entropy loop is Python — fine for
thumbnails/tests and honest plumbing; a production deployment would
`multimodal.set_decoder()` a libjpeg binding, keeping the identical
Spark-side schema and batch shape.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K (K.1/K.2) example quantization tables, natural order via zigzag
_QUANT_LUMA_ZZ = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)[np.argsort(ZIGZAG)]  # -> natural order
_QUANT_CHROMA_ZZ = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)[np.argsort(ZIGZAG)]

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 DCT-II orthonormal basis matrix: IDCT(block) = C.T @ B @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _build_decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical per T.81 Annex C."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    out = {}
    for (length, code), sym in _build_decode_table(bits, huffval).items():
        out[sym] = (code, length)
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes with FF00 unstuffing
    and RSTn tolerance."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                return self.nbits > 0
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    return self.nbits > 0  # restart marker: stop at boundary
                else:
                    return self.nbits > 0  # any other marker ends the scan
            else:
                self.pos += 1
            self.cur = (self.cur << 8) | b
            self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError
        self.nbits -= 1
        bit = (self.cur >> self.nbits) & 1
        # drop the consumed bit: cur must stay < 2^nbits, else every _fill
        # shift grows an unbounded bigint and decode goes quadratic in
        # scan size (measured 37.5s -> 0.55s on a 256x256 baseline JPEG)
        self.cur &= (1 << self.nbits) - 1
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Drop partial byte, skip an RSTn marker."""
        self.cur = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _decode_huff(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray | None:
    """Baseline JFIF bytes -> HxWx3 uint8 RGB, or None when not a
    parseable baseline sequential JPEG."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    try:
        return _decode_jpeg_inner(data)
    except (ValueError, EOFError, IndexError, KeyError, struct.error,
            ZeroDivisionError):
        return None


def decode_jpeg_coefficients(data: bytes):
    """Entropy-layer test hook: decode a progressive/arithmetic JPEG to
    its per-component zigzag coefficient buffers WITHOUT dequant/IDCT —
    the exact integers an independent decoder (the golden-generating
    libjpeg) must agree on. Returns (frame, {cid: (by, bx, 64) int32})
    or None."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    try:
        return _decode_jpeg_inner(data, return_coeffs=True)
    except (ValueError, EOFError, IndexError, KeyError, struct.error,
            ZeroDivisionError):
        return None


def _decode_jpeg_inner(data: bytes, return_coeffs: bool = False):
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps) comps = [(cid, hs, vs, tq)]
    progressive = False
    arithmetic = False
    dc_cond: dict[int, tuple] = {}  # DAC: table -> (L, U)
    ac_cond: dict[int, int] = {}    # DAC: table -> Kx
    coeffs = None  # progressive/arith: cid -> (blocks_y, blocks_x, 64) zigzag
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them so seglen is read from the real segment
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            return None
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    return None  # 16-bit tables: 12-bit precision input
                vals = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = vals
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC2, 0xC9, 0xCA):
            # SOF0 baseline / SOF2 progressive huffman /
            # SOF9 sequential arithmetic / SOF10 progressive arithmetic
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):  # A.1.1
                    return None
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
            progressive = marker in (0xC2, 0xCA)
            arithmetic = marker in (0xC9, 0xCA)
            if progressive or arithmetic:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                coeffs = {
                    cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                    for cid, hs, vs, _tq in comps
                }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # other frame types (lossless, hierarchical, ...)
        elif marker == 0xCC:  # DAC — arithmetic conditioning (B.2.4.3)
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 0xF
                cs = body[i + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 0xF, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs  # Kx
                i += 2
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nsym = sum(bits)
                huffval = list(body[i + 17 : i + 17 + nsym])
                tbl = _build_decode_table(bits, huffval)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            if not progressive and not arithmetic:
                return _decode_scan(
                    data, pos + 2 + seglen, frame, scan, qt, huff_dc,
                    huff_ac, restart_interval,
                )
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            if arithmetic:
                from letarette_spark.functions import jpeg_arith

                if not progressive:
                    end = jpeg_arith.decode_sequential_scan(
                        data, pos + 2 + seglen, frame, scan, coeffs,
                        dc_cond, ac_cond, restart_interval,
                    )
                else:
                    end = jpeg_arith.decode_progressive_scan(
                        data, pos + 2 + seglen, frame, scan, coeffs,
                        dc_cond, ac_cond, restart_interval,
                        ss, se, a >> 4, a & 0xF,
                    )
            else:
                end = _progressive_scan(
                    data, pos + 2 + seglen, frame, scan, coeffs,
                    huff_dc, huff_ac, restart_interval, ss, se, a >> 4, a & 0xF,
                )
            # resume header parsing at the next real marker
            pos = end
            while pos + 1 < len(data):
                if (
                    data[pos] == 0xFF
                    and data[pos + 1] != 0x00
                    and not (0xD0 <= data[pos + 1] <= 0xD7)
                ):
                    break
                pos += 1
            continue
        pos += 2 + seglen
    if (progressive or arithmetic) and frame is not None:
        if return_coeffs:
            return frame, coeffs
        return _reconstruct_progressive(frame, coeffs, qt)
    return None


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
    scan_map = {cs: (td, ta) for cs, td, ta in scan}
    pred = {cid: 0 for cid, *_ in comps}
    r = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                r.align_restart()
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, tq in comps:
                td, ta = scan_map[cid]
                dctab, actab = huff_dc[td], huff_ac[ta]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _decode_huff(r, dctab)
                        diff = _extend(r.receive(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, actab)
                            rrrr, ssss = rs >> 4, rs & 0xF
                            if ssss == 0:
                                if rrrr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise ValueError("AC overrun")
                            zz[k] = _extend(r.receive(ssss), ssss)
                            k += 1
                        blk = np.zeros(64, dtype=np.int32)
                        blk[ZIGZAG] = zz
                        px = _idct2(blk.reshape(8, 8) * q) + 128.0
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    return _planes_to_rgb(frame, planes, hmax, vmax)


def _planes_to_rgb(frame, planes, hmax, vmax) -> np.ndarray:
    """Upsample component planes to full resolution and convert."""
    h, w, comps = frame
    out_planes = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = out_planes
    rch = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([rch, g, b], axis=2).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 Annex G, huffman coding. Each scan
# deposits or refines quantized coefficients in per-component zigzag
# buffers; reconstruction dequantizes + IDCTs once at the end.
# ---------------------------------------------------------------------------


def _comp_block_dims(frame, cid):
    """Non-interleaved block grid for one component (T.81 A.2.2)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    hs, vs = next((c[1], c[2]) for c in comps if c[0] == cid)
    cw = -(-w * hs // hmax)
    ch = -(-h * vs // vmax)
    return -(-ch // 8), -(-cw // 8)


def _require(tables, idx, ah):
    """DC-first scans need a real table; refine scans (ah>0) read raw
    bits only, so a missing table spec is fine there."""
    t = tables.get(idx)
    if t is None and ah == 0:
        raise ValueError("missing DC huffman table")
    return t


def _progressive_scan(
    data, pos, frame, scan, coeffs, huff_dc, huff_ac, dri,
    ss, se, ah, al,
) -> int:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_of = {c[0]: c for c in comps}
    r = _BitReader(data, pos)
    pred = {cs: 0 for cs, _td, _ta in scan}  # fresh per scan
    eobrun = 0

    def maybe_restart(n_done):
        nonlocal eobrun
        if dri and n_done and n_done % dri == 0:
            r.align_restart()
            for k in pred:
                pred[k] = 0
            eobrun = 0

    if ss == 0:
        # ---- DC scan (interleaved when ns > 1) ----
        n_done = 0
        if len(scan) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(n_done)
                    for cs, td, _ta in scan:
                        _cid, hs, vs, _tq = comp_of[cs]
                        for by in range(vs):
                            for bx in range(hs):
                                _dc_unit(
                                    r, coeffs[cs], my * vs + by,
                                    mx * hs + bx, _require(huff_dc, td, ah), pred,
                                    cs, ah, al,
                                )
                    n_done += 1
        else:
            cs, td, _ta = scan[0]
            bh, bw = _comp_block_dims(frame, cs)
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart(n_done)
                    _dc_unit(r, coeffs[cs], by, bx, _require(huff_dc, td, ah), pred,
                             cs, ah, al)
                    n_done += 1
    else:
        # ---- AC scan: always single-component, non-interleaved ----
        cs, _td, ta = scan[0]
        bh, bw = _comp_block_dims(frame, cs)
        actab = huff_ac.get(ta)
        if actab is None and ah == 0:
            raise ValueError("missing AC huffman table")
        n_done = 0
        for by in range(bh):
            for bx in range(bw):
                maybe_restart(n_done)
                blk = coeffs[cs][by, bx]
                if ah == 0:
                    eobrun = _ac_first_unit(r, blk, actab, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_unit(r, blk, actab, ss, se, al, eobrun)
                n_done += 1
    return r.pos


def _dc_unit(r, cbuf, by, bx, dctab, pred, cs, ah, al):
    if ah == 0:
        t = _decode_huff(r, dctab)
        diff = _extend(r.receive(t), t)
        pred[cs] += diff
        cbuf[by, bx, 0] = pred[cs] << al
    else:
        if r.read_bit():
            cbuf[by, bx, 0] |= 1 << al


def _ac_first_unit(r, blk, actab, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(r, actab)
        rrrr, ssss = rs >> 4, rs & 0xF
        if ssss == 0:
            if rrrr == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << rrrr) - 1
            if rrrr:
                eobrun += r.receive(rrrr)
            return eobrun
        k += rrrr
        if k > se:
            raise ValueError("AC overrun")
        blk[k] = _extend(r.receive(ssss), ssss) << al
        k += 1
    return 0


def _ac_refine_unit(r, blk, actab, ss, se, al, eobrun) -> int:
    """T.81 G.1.2.3 correction-bit refinement."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(r, actab)
            rrrr, ssss = rs >> 4, rs & 0xF
            newval = 0
            if ssss == 0:
                if rrrr < 15:
                    # INCLUSIVE of the current block: its remaining band
                    # still consumes correction bits below
                    eobrun = 1 << rrrr
                    if rrrr:
                        eobrun += r.receive(rrrr)
                    break
                # ZRL: advance over 16 zero-history coefficients
            else:
                newval = p1 if r.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if r.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if rrrr == 0:
                        break
                    rrrr -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        # correction bits for the remainder of this block's band
        while k <= se:
            if blk[k] != 0:
                if r.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coeffs, qt) -> np.ndarray | None:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, hs, vs, tq in comps:
        if tq not in qt or cid not in coeffs:
            return None
        q = qt[tq]
        cbuf = coeffs[cid]
        bh, bw = cbuf.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                blk = np.zeros(64, dtype=np.int32)
                blk[ZIGZAG] = cbuf[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct2(blk.reshape(8, 8) * q) + 128.0
                )
        planes[cid] = plane
    return _planes_to_rgb(frame, planes, hmax, vmax)


# ---------------------------------------------------------------------------
# encoder (4:4:4 baseline, Annex K tables) — test-input producer
# ---------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_seg(tq: int, tbl) -> bytes:
    return _seg(0xDB, bytes([tq]) + bytes(int(x) for x in tbl.reshape(-1)[ZIGZAG]))


def _dht_seg(tc: int, th: int, spec) -> bytes:
    bits, vals = spec
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.cur = (self.cur << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.cur)
            if self.cur == 0xFF:
                self.out.append(0x00)
            self.cur = 0
            self.nbits = 0


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scale_quant(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF bytes (4:4:4 or 4:2:0)."""
    h, w, c = pixels.shape
    assert c == 3
    assert subsampling in ("444", "420")
    ql = _scale_quant(_QUANT_LUMA_ZZ, quality).reshape(8, 8)
    qc = _scale_quant(_QUANT_CHROMA_ZZ, quality).reshape(8, 8)

    p = pixels.astype(np.float64)
    y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
    cb = -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2] + 128.0
    cr = 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2] + 128.0

    dc_l = _build_encode_table(*_DC_LUMA)
    ac_l = _build_encode_table(*_AC_LUMA)
    dc_c = _build_encode_table(*_DC_CHROMA)
    ac_c = _build_encode_table(*_AC_CHROMA)

    bw = _BitWriter()
    pred = [0, 0, 0]

    def encode_block(ch, by, bx, q, dct_t, act_t, ci):
        blk = _dct2(ch[by : by + 8, bx : bx + 8] - 128.0)
        coef = np.round(blk / q).astype(np.int32)
        zz = coef.reshape(-1)[ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = _csize(diff)
        code, ln = dct_t[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last_nz = nz[-1] + 1 if len(nz) else 0
        for k in range(1, 64):
            if k > last_nz:
                break
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act_t[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _csize(v)
            code, ln = act_t[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = act_t[0x00]  # EOB
            bw.write(code, ln)

    if subsampling == "444":
        hs = vs = 1
        H = -(-h // 8) * 8
        W = -(-w // 8) * 8
        pad = lambda ch: np.pad(ch, ((0, H - h), (0, W - w)), mode="edge")
        yp, cbp, crp = pad(y), pad(cb), pad(cr)
        for by in range(0, H, 8):
            for bx in range(0, W, 8):
                encode_block(yp, by, bx, ql, dc_l, ac_l, 0)
                encode_block(cbp, by, bx, qc, dc_c, ac_c, 1)
                encode_block(crp, by, bx, qc, dc_c, ac_c, 2)
    else:  # 4:2:0 — MCU = 16x16: 4 luma blocks + 1 cb + 1 cr (2x2 mean)
        hs = vs = 2
        H = -(-h // 16) * 16
        W = -(-w // 16) * 16
        pad = lambda ch: np.pad(ch, ((0, H - h), (0, W - w)), mode="edge")
        yp = pad(y)
        down = lambda ch: pad(ch).reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        cbp, crp = down(cb), down(cr)
        for my in range(0, H, 16):
            for mx in range(0, W, 16):
                for sy in (0, 8):
                    for sx in (0, 8):
                        encode_block(yp, my + sy, mx + sx, ql, dc_l, ac_l, 0)
                encode_block(cbp, my // 2, mx // 2, qc, dc_c, ac_c, 1)
                encode_block(crp, my // 2, mx // 2, qc, dc_c, ac_c, 2)
    bw.flush()

    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes(
        [3, 1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _dqt_seg(0, ql) + _dqt_seg(1, qc)
        + _dht_seg(0, 0, _DC_LUMA) + _dht_seg(1, 0, _AC_LUMA)
        + _dht_seg(0, 1, _DC_CHROMA) + _dht_seg(1, 1, _AC_CHROMA)
        + sof + sos + bytes(bw.out) + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# progressive encoder (4:4:4, SOF2) — spectral selection + successive
# approximation, Annex K tables, per-block EOB0 (no EOBRUN > 1, which
# Annex K tables cannot express). Exists to prove the progressive
# DECODER: the same quantized coefficients emitted baseline and
# progressive must reconstruct to identical pixels.
# ---------------------------------------------------------------------------


def encode_progressive_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    h, w, c = pixels.shape
    assert c == 3
    ql = _scale_quant(_QUANT_LUMA_ZZ, quality).reshape(8, 8)
    qc = _scale_quant(_QUANT_CHROMA_ZZ, quality).reshape(8, 8)

    p = pixels.astype(np.float64)
    y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
    cb = -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2] + 128.0
    cr = 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2] + 128.0

    H = -(-h // 8) * 8
    W = -(-w // 8) * 8
    pad = lambda ch: np.pad(ch, ((0, H - h), (0, W - w)), mode="edge")
    chans = [(pad(y), ql), (pad(cb), qc), (pad(cr), qc)]
    bh, bw_ = H // 8, W // 8

    # quantized zigzag coefficients per component/block — computed once
    zz = []
    for ch, q in chans:
        arr = np.zeros((bh, bw_, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw_):
                blk = _dct2(ch[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0)
                arr[by, bx] = np.round(blk / q).astype(np.int32).reshape(-1)[ZIGZAG]
        zz.append(arr)

    dc_t = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA),
            _build_encode_table(*_DC_CHROMA)]
    ac_t = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA),
            _build_encode_table(*_AC_CHROMA)]

    def sos_header(comps_spec, ss, se, ah, al):
        body = bytes([len(comps_spec)])
        for cid, td, ta in comps_spec:
            body += bytes([cid, (td << 4) | ta])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray()

    # scan 1: DC first, all components interleaved, Al=1
    bwr = _BitWriter()
    pred = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(3):
                v = int(zz[ci][by, bx, 0]) >> 1  # DC point transform
                diff = v - pred[ci]
                pred[ci] = v
                t = _csize(diff)
                code, ln = dc_t[ci][t]
                bwr.write(code, ln)
                if t:
                    bwr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bwr.flush()
    out += sos_header([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1)
    out += bytes(bwr.out)

    # scan 2: DC refine, Ah=1 Al=0 (raw bits, no huffman)
    bwr = _BitWriter()
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(3):
                bwr.write(int(zz[ci][by, bx, 0]) & 1, 1)
    bwr.flush()
    out += sos_header([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0)
    out += bytes(bwr.out)

    # per-component AC scans
    for ci, cid in ((0, 1), (1, 2), (2, 3)):
        act = ac_t[ci]
        # AC first: band 1-63, Al=1
        bwr = _BitWriter()
        for by in range(bh):
            for bx in range(bw_):
                band = zz[ci][by, bx]
                run = 0
                emitted = False
                for k in range(1, 64):
                    v = int(band[k])
                    t = abs(v) >> 1  # AC point transform: toward zero
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        bwr.write(code, ln)
                        run -= 16
                    s = _csize(t)
                    code, ln = act[(run << 4) | s]
                    bwr.write(code, ln)
                    tv = t if v > 0 else -t
                    bwr.write(tv if tv >= 0 else tv + (1 << s) - 1, s)
                    run = 0
                    emitted = True
                if run or not emitted:
                    code, ln = act[0x00]  # EOB0
                    bwr.write(code, ln)
        bwr.flush()
        out += sos_header([(cid, 0, 0 if ci == 0 else 1)], 1, 63, 0, 1)
        out += bytes(bwr.out)

    for ci, cid in ((0, 1), (1, 2), (2, 3)):
        act = ac_t[ci]
        # AC refine: band 1-63, Ah=1 -> Al=0 (T.81 G.1.2.3 inverse)
        bwr = _BitWriter()
        for by in range(bh):
            for bx in range(bw_):
                band = zz[ci][by, bx]
                temps = [abs(int(band[k])) for k in range(64)]
                eob = 0
                for k in range(1, 64):
                    if temps[k] == 1:  # newly significant at this level
                        eob = k
                run = 0
                br: list[int] = []
                for k in range(1, 64):
                    t = temps[k]
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eob:
                        code, ln = act[0xF0]
                        bwr.write(code, ln)
                        run -= 16
                        for b in br:
                            bwr.write(b, 1)
                        br = []
                    if t > 1:  # already significant: correction bit
                        br.append(t & 1)
                        continue
                    # newly significant: (run, 1) + sign + buffered bits
                    code, ln = act[(run << 4) | 1]
                    bwr.write(code, ln)
                    bwr.write(1 if int(band[k]) > 0 else 0, 1)
                    for b in br:
                        bwr.write(b, 1)
                    br = []
                    run = 0
                if run or br:
                    code, ln = act[0x00]  # EOB0
                    bwr.write(code, ln)
                    for b in br:
                        bwr.write(b, 1)
        bwr.flush()
        out += sos_header([(cid, 0, 0 if ci == 0 else 1)], 1, 63, 1, 0)
        out += bytes(bwr.out)

    sof = _seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _dqt_seg(0, ql) + _dqt_seg(1, qc)
        + _dht_seg(0, 0, _DC_LUMA) + _dht_seg(1, 0, _AC_LUMA)
        + _dht_seg(0, 1, _DC_CHROMA) + _dht_seg(1, 1, _AC_CHROMA)
        + sof + bytes(out) + b"\xff\xd9"
    )
