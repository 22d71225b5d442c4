"""Arithmetic-coded JPEG entropy codec — ITU-T T.81 Annex D (QM coder),
F.2.4 (sequential DCT statistical models) and G.2 (progressive models).

This closes the arithmetic half of the multimodal codec boundary noted in
round 4: SOF9 (extended sequential, arithmetic) and SOF10 (progressive,
arithmetic) JFIF files entropy-decode here into the same per-component
zigzag coefficient buffers jpeg.py uses for progressive reconstruction,
so dequantization/IDCT/upsampling stay shared (jpeg.py:330-332 routes
both arithmetic frame types through _reconstruct_progressive).

Provenance (public sources only):
- The algorithm is the published T.81 Annex D QM coder with the Annex
  F.2.4 / G.2 statistical models. Conventions the prose of the spec
  leaves easy to get backwards (the MPS owns the LOWER subinterval; the
  entropy stream is BYTE-stuffed: 0xFF 0x00 carries a data byte 0xFF,
  and a real marker feeds zero bytes to the decoder) were confirmed by
  disassembling the system libjpeg's compiled jdarith/jcarith objects —
  the same compiled-artifact-recovery technique the snowball stemmer
  tables use (tools/extract_among.py).
- The probability state machine is T.81 Table D.3. The literal below was
  recovered from the compiled `jpeg_aritab` object (jaricom) rather than
  typed from the spec, to avoid transcription errors. Entry 113 is the
  fixed-probability state (Qe=0x5A1D, self-transitioning, never adapted)
  used for sign and refinement decisions.
- Interop is golden-pinned against the compiled library itself
  (tools/gen_jpeg_arith_goldens.py + tests/test_jpeg_arith.py): files
  the library encoded must entropy-decode here to the library's own
  coefficient dump, and files this module encodes must decode
  identically under the library.

Like every codec in this package (CLAUDE.md invariant), the decode path
must never raise on arbitrary bytes — jpeg.py wraps it in the same
exception net as the huffman paths.
"""

from __future__ import annotations

# T.81 Table D.3 rows: (Qe, NMPS, NLPS, SWITCH); index = state.
# Recovered from the compiled jaricom object of the system libjpeg.
TBL = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0), (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0), (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0), (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1), (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0), (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0), (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0), (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0), (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0), (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0), (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0), (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0), (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0), (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0), (0x0363, 54, 51, 0), (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0), (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0), (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0), (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0), (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0), (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0), (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1), (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0), (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0), (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0), (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0), (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0), (0x5231, 102, 105, 0), (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0), (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

FIXED = 113  # fixed-probability pseudo-state (never adapts)

# statistical-model sizes (T.81 Tables F.4/F.5; per table id)
DC_BINS = 64
AC_BINS = 256

# default conditioning (T.81 F.1.4.4.1.4 / F.1.4.4.2.1)
DC_DEFAULT = (0, 1)  # (L, U)
AC_DEFAULT = 5       # Kx


# ---------------------------------------------------------------------------
# Annex D.2 — decoder (register discipline of the compiled reference:
# renorm-first, lazy C alignment, fetch-on-demand)
# ---------------------------------------------------------------------------


class ArithDecoder:
    """QM decoder over one entropy-coded segment. 0xFF 0x00 in the
    stream is a stuffed data byte 0xFF; 0xFF followed by anything else
    is a marker — from then on the decoder is fed zero bytes, so
    truncated files decode without running off the end."""

    __slots__ = ("data", "end", "bp", "c", "a", "ct", "at_marker")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.end = len(data)
        self.bp = pos
        self.c = 0
        self.a = 0
        self.ct = -16
        self.at_marker = False

    def _fetch(self) -> int:
        if self.at_marker:
            return 0
        bp = self.bp
        if bp >= self.end:
            self.at_marker = True
            return 0
        b = self.data[bp]
        bp += 1
        if b == 0xFF:
            # skip fill bytes, then: 0x00 -> stuffed data 0xFF, else marker
            while bp < self.end and self.data[bp] == 0xFF:
                bp += 1
            if bp < self.end and self.data[bp] == 0:
                self.bp = bp + 1
                return 0xFF
            self.at_marker = True
            self.bp = bp - 1  # leave the 0xFF of the marker in place
            return 0
        self.bp = bp
        return b

    def decode(self, stats: bytearray, i: int) -> int:
        a = self.a
        # renormalization + input (D.2.6)
        if a < 0x8000:
            if self.ct == -16:
                # INITDEC: prime the code register with two bytes
                b1 = self._fetch()
                self.c = (b1 << 8) | self._fetch()
                self.ct = 0
                a = 0x10000
            else:
                c = self.c
                ct = self.ct
                while True:
                    ct -= 1
                    if ct < 0:
                        c = (c << 8) | self._fetch()
                        ct += 8
                    a <<= 1
                    if a >= 0x8000:
                        break
                self.c = c
                self.ct = ct
        # decision (D.2.2 with conditional exchange; MPS owns the lower
        # subinterval)
        sv = stats[i]
        qe, nmps, nlps, sw = TBL[sv & 0x7F]
        a -= qe
        lps_lo = a << self.ct
        if self.c < lps_lo:
            if a >= 0x8000:
                self.a = a
                return sv >> 7
            if a < qe:  # exchange: the small bottom interval is the LPS
                stats[i] = (sv & 0x80) ^ ((sw << 7) | nlps)
                self.a = a
                return (sv >> 7) ^ 1
            stats[i] = (sv & 0x80) | nmps
            self.a = a
            return sv >> 7
        self.c -= lps_lo
        if qe > a:  # exchange: the top interval is the MPS
            stats[i] = (sv & 0x80) | nmps
            d = sv >> 7
        else:
            stats[i] = (sv & 0x80) ^ ((sw << 7) | nlps)
            d = (sv >> 7) ^ 1
        self.a = qe
        return d


# ---------------------------------------------------------------------------
# F.2.4 / G.2 — statistical models (decode side)
# ---------------------------------------------------------------------------


def _dc_diff(ad: ArithDecoder, stats: bytearray, ctx: int, lo: int, up: int):
    """Decode one DC difference (F.2.4.1). Returns (diff, next_context)."""
    st = ctx
    if ad.decode(stats, st) == 0:
        return 0, 0
    sign = ad.decode(stats, st + 1)
    st += 2 + sign
    m = ad.decode(stats, st)
    if m:
        st = 20  # X1 (Table F.4)
        while ad.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC magnitude overflow")
            st += 1
    # conditioning category for the NEXT block (F.1.4.4.1.2)
    if m < (1 << lo) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + (sign << 2)
    else:
        nctx = 4 + (sign << 2)
    v = m
    st += 14  # M bins (Table F.4)
    m >>= 1
    while m:
        if ad.decode(stats, st):
            v |= m
        m >>= 1
    v += 1
    return (-v if sign else v), nctx


def _ac_band(ad, stats, fixed, zz, kx, lo_k, hi_k, al):
    """Decode AC coefficients for zigzag band [lo_k, hi_k] of one block
    (F.2.4.2; G.2 first pass when al > 0). Writes shifted values."""
    k = lo_k
    while k <= hi_k:
        st = 3 * (k - 1)
        if ad.decode(stats, st):
            return  # EOB
        while ad.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > hi_k:
                raise ValueError("AC overrun")
        sign = ad.decode(fixed, 0)
        st += 2
        m = ad.decode(stats, st)
        if m:
            if ad.decode(stats, st):
                m <<= 1
                st = 189 if k <= kx else 217
                while ad.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        m >>= 1
        while m:
            if ad.decode(stats, st):
                v |= m
            m >>= 1
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _ac_refine(ad, stats, fixed, zz, ss, se, al):
    """G.2.2 AC refinement: correction bits for known coefficients,
    newly-significant insertions, EOB decisions above the previous
    stage's end-of-block index."""
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex > 0 and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if ad.decode(stats, st):
                return  # EOB
        while True:
            v = zz[k]
            if v:
                if ad.decode(stats, st + 2):
                    zz[k] = v + (m1 if v < 0 else p1)
                break
            if ad.decode(stats, st + 1):
                zz[k] = m1 if ad.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC refine overrun")
        k += 1


def _comp_block_dims(frame, cid):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    hs, vs = next((c[1], c[2]) for c in comps if c[0] == cid)
    cw = -(-w * hs // hmax)
    ch = -(-h * vs // vmax)
    return -(-ch // 8), -(-cw // 8)


def _next_restart(data: bytes, pos: int) -> int:
    """Scan for the next RSTn marker at/after pos. Unambiguous: inside
    arithmetic entropy data every 0xFF is followed by 0x00."""
    end = len(data)
    while pos + 1 < end:
        if data[pos] == 0xFF and 0xD0 <= data[pos + 1] <= 0xD7:
            return pos + 2
        pos += 1
    raise ValueError("missing restart marker")


class _ScanState:
    """Per-scan statistics areas + DC predictions, reset at restarts
    (F.2.1.3.1)."""

    def __init__(self, scan):
        self.dc_stats = {td: bytearray(DC_BINS) for _cs, td, _ta in scan}
        self.ac_stats = {ta: bytearray(AC_BINS) for _cs, _td, ta in scan}
        self.fixed = bytearray((FIXED,))
        self.last_dc = {cs: 0 for cs, *_ in scan}
        self.dc_ctx = {cs: 0 for cs, *_ in scan}

    def reset(self):
        for b in self.dc_stats.values():
            b[:] = bytes(len(b))
        for b in self.ac_stats.values():
            b[:] = bytes(len(b))
        self.fixed[0] = FIXED
        for cs in self.last_dc:
            self.last_dc[cs] = 0
            self.dc_ctx[cs] = 0


def decode_sequential_scan(
    data, pos, frame, scan, coeffs, dc_cond, ac_cond, dri
) -> int:
    """SOF9 scan: interleaved (or single-component) DC+AC decode into the
    zigzag coefficient buffers. Returns where entropy data ended."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_of = {c[0]: c for c in comps}
    tdta = {cs: (td, ta) for cs, td, ta in scan}
    st = _ScanState(scan)

    if len(scan) > 1:
        units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]
    else:
        bh, bw = _comp_block_dims(frame, scan[0][0])
        units = [(by, bx) for by in range(bh) for bx in range(bw)]

    ad = ArithDecoder(data, pos)
    n_done = 0
    for uy, ux in units:
        if dri and n_done and n_done % dri == 0:
            ad = ArithDecoder(data, _next_restart(data, ad.bp))
            st.reset()
        if len(scan) > 1:
            blocks = [
                (cid, uy * vs + by, ux * hs + bx)
                for cid, hs, vs, _tq in (comp_of[cs] for cs, *_ in scan)
                for by in range(vs)
                for bx in range(hs)
            ]
        else:
            blocks = [(scan[0][0], uy, ux)]
        for cid, by, bx in blocks:
            td, ta = tdta[cid]
            lo, up = dc_cond.get(td, DC_DEFAULT)
            kx = ac_cond.get(ta, AC_DEFAULT)
            zz = coeffs[cid][by, bx]
            diff, st.dc_ctx[cid] = _dc_diff(
                ad, st.dc_stats[td], st.dc_ctx[cid], lo, up
            )
            st.last_dc[cid] += diff
            zz[0] = st.last_dc[cid]
            _ac_band(ad, st.ac_stats[ta], st.fixed, zz, kx, 1, 63, 0)
        n_done += 1
    return ad.bp


def decode_progressive_scan(
    data, pos, frame, scan, coeffs, dc_cond, ac_cond, dri, ss, se, ah, al
) -> int:
    """SOF10 scan (Annex G.2): DC first/refine (interleaved allowed) or
    single-component AC first/refine into the zigzag buffers."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_of = {c[0]: c for c in comps}
    st = _ScanState(scan)
    ad = ArithDecoder(data, pos)
    n_done = 0

    def maybe_restart():
        nonlocal ad
        if dri and n_done and n_done % dri == 0:
            ad = ArithDecoder(data, _next_restart(data, ad.bp))
            st.reset()

    if ss == 0:
        if len(scan) > 1:
            mcu_blocks = [
                (cs, td, comp_of[cs][1], comp_of[cs][2])
                for cs, td, _ta in scan
            ]
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for cs, td, hs, vs in mcu_blocks:
                        for by in range(vs):
                            for bx in range(hs):
                                _dc_scan_unit(
                                    ad, st, coeffs[cs], my * vs + by,
                                    mx * hs + bx, cs, td, dc_cond, ah, al,
                                )
                    n_done += 1
        else:
            cs, td, _ta = scan[0]
            bh, bw = _comp_block_dims(frame, cs)
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    _dc_scan_unit(
                        ad, st, coeffs[cs], by, bx, cs, td, dc_cond, ah, al
                    )
                    n_done += 1
    else:
        # AC scans: single component, non-interleaved
        cs, _td, ta = scan[0]
        kx = ac_cond.get(ta, AC_DEFAULT)
        bh, bw = _comp_block_dims(frame, cs)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                zz = coeffs[cs][by, bx]
                if ah == 0:
                    _ac_band(ad, st.ac_stats[ta], st.fixed, zz, kx, ss, se, al)
                else:
                    _ac_refine(ad, st.ac_stats[ta], st.fixed, zz, ss, se, al)
                n_done += 1
    return ad.bp


def _dc_scan_unit(ad, st, cbuf, by, bx, cs, td, dc_cond, ah, al):
    if ah == 0:
        lo, up = dc_cond.get(td, DC_DEFAULT)
        diff, st.dc_ctx[cs] = _dc_diff(
            ad, st.dc_stats[td], st.dc_ctx[cs], lo, up
        )
        st.last_dc[cs] += diff
        cbuf[by, bx, 0] = st.last_dc[cs] << al
    else:
        # G.2.1 refinement: one fixed-probability bit per block
        if ad.decode(st.fixed, 0):
            cbuf[by, bx, 0] |= 1 << al


# ---------------------------------------------------------------------------
# Annex D.1 — encoder (byteout/flush discipline of the compiled
# reference: pending-byte buffer, stacked 0xFF run, deferred zero run)
# ---------------------------------------------------------------------------


class ArithEncoder:
    __slots__ = ("out", "c", "a", "ct", "buffer", "sc", "zc")

    def __init__(self) -> None:
        self.out = bytearray()
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.buffer = -1  # pending byte (a later carry may bump it)
        self.sc = 0       # stacked 0xFF bytes (may overflow to 0x00)
        self.zc = 0       # deferred 0x00 bytes (dropped at flush if trailing)

    def _flush_zc(self) -> None:
        if self.zc:
            self.out.extend(b"\x00" * self.zc)
            self.zc = 0

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: bump the pending byte; stacked 0xFFs overflowed to 0x00
            if self.buffer >= 0:
                self._flush_zc()
                self.out.append(self.buffer + 1)
                if self.buffer == 0xFE:
                    self.out.append(0)  # stuff after the carried-into 0xFF
            self.zc += self.sc
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer > 0:
                self._flush_zc()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_zc()
                self.out.extend(b"\xff\x00" * self.sc)
                self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, stats: bytearray, i: int, d: int) -> None:
        sv = stats[i]
        qe, nmps, nlps, sw = TBL[sv & 0x7F]
        self.a -= qe
        if d != sv >> 7:
            # LPS: normally the top subinterval (conditional exchange
            # gives it the small bottom one)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            stats[i] = (sv & 0x80) ^ ((sw << 7) | nlps)
        else:
            # MPS: normally the bottom subinterval (C unchanged)
            if self.a & 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            stats[i] = (sv & 0x80) | nmps
        while True:  # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                return

    def finish(self) -> bytes:
        """D.1.8-9: choose the code value in the final interval with the
        most trailing zeros, discharge, drop trailing zero bytes."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # final carry into the pending byte
            if self.buffer >= 0:
                self._flush_zc()
                self.out.append(self.buffer + 1)
                if self.buffer == 0xFE:
                    self.out.append(0)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer > 0:
                self._flush_zc()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_zc()
                self.out.extend(b"\xff\x00" * self.sc)
                self.sc = 0
        if self.c & 0x7FFF800:
            self._flush_zc()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)
            if self.c & 0x7F800:
                self.out.append((self.c >> 11) & 0xFF)
        self.buffer = -1
        self.sc = 0
        self.zc = 0
        return bytes(self.out)


# ------------------------------------------------------------------ models


def _encode_dc_diff(enc, stats, ctx, lo, up, diff):
    """F.1.4.1 / F.1.4.4.1: encode one DC difference; returns next ctx."""
    st = ctx
    if diff == 0:
        enc.encode(stats, st, 0)
        return 0
    enc.encode(stats, st, 1)
    sign = 1 if diff < 0 else 0
    m = (-diff if sign else diff) - 1
    enc.encode(stats, st + 1, sign)
    st += 2 + sign
    if m == 0:
        enc.encode(stats, st, 0)
        st += 14
    else:
        enc.encode(stats, st, 1)
        nbits = m.bit_length()
        st = 20
        for _ in range(nbits - 1):
            enc.encode(stats, st, 1)
            st += 1
        enc.encode(stats, st, 0)
        st += 14
        bit = (1 << (nbits - 1)) >> 1
        while bit:
            enc.encode(stats, st, 1 if m & bit else 0)
            bit >>= 1
    if m < (1 << lo) >> 1:
        return 0
    if m > (1 << up) >> 1:
        return 12 + (sign << 2)
    return 4 + (sign << 2)


def _shifted(v: int, al: int) -> int:
    """Point transform: magnitude shift preserving sign (G.1.3.1)."""
    return -((-v) >> al) if v < 0 else v >> al


def _encode_ac_band(enc, stats, fixed, zz, kx, lo_k, hi_k, al):
    """F.1.4.2 / G.1.3.2: encode the AC band of one block."""
    ke = hi_k
    while ke >= lo_k and _shifted(int(zz[ke]), al) == 0:
        ke -= 1
    k = lo_k
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB yet
        v = _shifted(int(zz[k]), al)
        while v == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
            v = _shifted(int(zz[k]), al)
        enc.encode(stats, st + 1, 1)
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        m = (-v if sign else v) - 1
        st += 2
        if m == 0:
            enc.encode(stats, st, 0)
        else:
            enc.encode(stats, st, 1)
            nbits = m.bit_length()
            if nbits == 1:
                enc.encode(stats, st, 0)
            else:
                enc.encode(stats, st, 1)
                st = 189 if k <= kx else 217
                for _ in range(nbits - 2):
                    enc.encode(stats, st, 1)
                    st += 1
                enc.encode(stats, st, 0)
        st += 14
        bit = (1 << (m.bit_length() - 1)) >> 1 if m else 0
        while bit:
            enc.encode(stats, st, 1 if m & bit else 0)
            bit >>= 1
        k += 1
    if ke < hi_k:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


def _encode_ac_refine_block(enc, stats, fixed, zz, ss, se, al):
    """G.1.3.3: successive-approximation AC refinement of one block."""
    ah = al + 1
    ke = se
    while ke >= ss and _shifted(int(zz[ke]), al) == 0:
        ke -= 1
    kex = ke
    while kex > 0 and _shifted(int(zz[kex]), ah) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(stats, st, 0)  # not EOB yet
        while True:
            v = int(zz[k])
            t = _shifted(v, al)
            if t:
                if t >> 1 if t > 0 else (-t) >> 1:
                    # previously nonzero: send the correction bit
                    enc.encode(stats, st + 2, abs(t) & 1)
                else:
                    # newly nonzero: significance + sign
                    enc.encode(stats, st + 1, 1)
                    enc.encode(fixed, 0, 1 if v < 0 else 0)
                break
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


# ---------------------------------------------------------------------------
# file-level encoder (SOF9 / SOF10) — the interop test-input producer,
# mirroring jpeg.encode_jpeg's pixel pipeline with arithmetic entropy
# ---------------------------------------------------------------------------


def _component_coeffs(pixels, quality, subsampling):
    """Forward pipeline shared with the huffman encoders: RGB -> YCbCr ->
    (optional 4:2:0 downsample) -> 8x8 DCT -> quantize -> zigzag buffers
    padded to MCU multiples. Returns (h, w, comps, buffers, ql, qc)."""
    import numpy as np

    from letarette_spark.functions.jpeg import (
        _QUANT_CHROMA_ZZ,
        _QUANT_LUMA_ZZ,
        _dct2,
        _scale_quant,
        ZIGZAG,
    )

    h, w, c = pixels.shape
    assert c == 3
    ql = _scale_quant(_QUANT_LUMA_ZZ, quality).reshape(8, 8)
    qc = _scale_quant(_QUANT_CHROMA_ZZ, quality).reshape(8, 8)
    p = pixels.astype(np.float64)
    y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
    cb = (-0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1]
          + 0.5 * p[:, :, 2] + 128.0)
    cr = (0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1]
          - 0.081312 * p[:, :, 2] + 128.0)

    if subsampling == "444":
        hs = vs = 1
        H, W = -(-h // 8) * 8, -(-w // 8) * 8
        pad = lambda ch: np.pad(ch, ((0, H - h), (0, W - w)), mode="edge")
        planes = {1: pad(y), 2: pad(cb), 3: pad(cr)}
    else:  # 420
        hs = vs = 2
        H, W = -(-h // 16) * 16, -(-w // 16) * 16
        pad = lambda ch: np.pad(ch, ((0, H - h), (0, W - w)), mode="edge")
        down = lambda ch: pad(ch).reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        planes = {1: pad(y), 2: down(cb), 3: down(cr)}

    comps = [(1, hs, vs, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    buffers = {}
    for cid, q in ((1, ql), (2, qc), (3, qc)):
        pl = planes[cid]
        bh, bw = pl.shape[0] // 8, pl.shape[1] // 8
        buf = np.zeros((bh, bw, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw):
                blk = _dct2(pl[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0)
                coef = np.round(blk / q).astype(np.int32)
                buf[by, bx] = coef.reshape(-1)[ZIGZAG]
        buffers[cid] = buf
    return h, w, comps, buffers, ql, qc


def _dac_seg():
    from letarette_spark.functions.jpeg import _seg

    lo, up = DC_DEFAULT
    cs_dc = (up << 4) | lo
    return _seg(0xCC, bytes([
        0x00, cs_dc, 0x01, cs_dc,          # DC tables 0/1: (L, U)
        0x10, AC_DEFAULT, 0x11, AC_DEFAULT,  # AC tables 0/1: Kx
    ]))


class _ScanEncoder:
    """One scan's encoder + statistics, with restart support
    (F.1.4.1.1: stats, DC predictions and the coder reset per interval,
    an RSTn marker between intervals)."""

    def __init__(self, scan):
        self.scan = scan
        self.out = bytearray()
        self.n_rst = 0
        self._fresh()

    def _fresh(self):
        self.enc = ArithEncoder()
        self.dc_stats = {td: bytearray(DC_BINS) for _cs, td, _ta in self.scan}
        self.ac_stats = {ta: bytearray(AC_BINS) for _cs, _td, ta in self.scan}
        self.fixed = bytearray((FIXED,))
        self.last_dc = {cs: 0 for cs, *_ in self.scan}
        self.dc_ctx = {cs: 0 for cs, *_ in self.scan}

    def restart(self):
        self.out.extend(self.enc.finish())
        self.out.extend(bytes([0xFF, 0xD0 + (self.n_rst & 7)]))
        self.n_rst += 1
        self._fresh()

    def finish(self) -> bytes:
        self.out.extend(self.enc.finish())
        return bytes(self.out)


def encode_arith_jpeg(
    pixels,
    quality: int = 90,
    subsampling: str = "444",
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB -> arithmetic-coded JFIF (SOF9, or SOF10 with a
    DC-first/AC-first/DC-refine/AC-refine successive-approximation
    script). Exists to prove the arithmetic DECODER both ways: the
    golden tests check the system libjpeg entropy-decodes these files to
    the exact coefficients this pipeline produced."""
    import struct as _struct

    from letarette_spark.functions.jpeg import _seg

    assert subsampling in ("444", "420")
    h, w, comps, buffers, ql, qc = _component_coeffs(
        pixels, quality, subsampling
    )
    from letarette_spark.functions.jpeg import _dqt_seg

    hs, vs = comps[0][1], comps[0][2]
    mcuy, mcux = buffers[1].shape[0] // vs, buffers[1].shape[1] // hs

    sof_marker = 0xCA if progressive else 0xC9
    sof = _seg(sof_marker, bytes([8]) + _struct.pack(">HH", h, w) + bytes(
        [3, 1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]))
    head = (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _dqt_seg(0, ql) + _dqt_seg(1, qc)
        + _dac_seg()
    )
    if restart_interval:
        head += _seg(0xDD, _struct.pack(">H", restart_interval))
    head += sof

    def sos(scan, ss, se, ah, al):
        body = bytes([len(scan)])
        for cs, td, ta in scan:
            body += bytes([cs, (td << 4) | ta])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    full_scan = [(1, 0, 0), (2, 1, 1), (3, 1, 1)]
    parts = [head]

    def seq_scan_bytes():
        se = _ScanEncoder(full_scan)
        lo, up = DC_DEFAULT
        n_done = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_done and \
                        n_done % restart_interval == 0:
                    se.restart()
                for cid, chs, cvs, _tq in comps:
                    td, ta = (0, 0) if cid == 1 else (1, 1)
                    for by in range(cvs):
                        for bx in range(chs):
                            zz = buffers[cid][my * cvs + by, mx * chs + bx]
                            diff = int(zz[0]) - se.last_dc[cid]
                            se.last_dc[cid] = int(zz[0])
                            se.dc_ctx[cid] = _encode_dc_diff(
                                se.enc, se.dc_stats[td], se.dc_ctx[cid],
                                lo, up, diff,
                            )
                            _encode_ac_band(
                                se.enc, se.ac_stats[ta], se.fixed, zz,
                                AC_DEFAULT, 1, 63, 0,
                            )
                n_done += 1
        return se.finish()

    if not progressive:
        parts.append(sos(full_scan, 0, 63, 0, 0))
        parts.append(seq_scan_bytes())
    else:
        lo, up = DC_DEFAULT

        # ---- DC first (al=1), interleaved ----
        parts.append(sos(full_scan, 0, 0, 0, 1))
        se = _ScanEncoder(full_scan)
        for my in range(mcuy):
            for mx in range(mcux):
                for cid, chs, cvs, _tq in comps:
                    td = 0 if cid == 1 else 1
                    for by in range(cvs):
                        for bx in range(chs):
                            dc = int(buffers[cid][my * cvs + by,
                                                  mx * chs + bx, 0]) >> 1
                            diff = dc - se.last_dc[cid]
                            se.last_dc[cid] = dc
                            se.dc_ctx[cid] = _encode_dc_diff(
                                se.enc, se.dc_stats[td], se.dc_ctx[cid],
                                lo, up, diff,
                            )
        parts.append(se.finish())

        # ---- AC first (al=1) per component (non-interleaved scans
        # cover the component's true block grid, not the MCU padding) ----
        frame = (h, w, comps)
        for cid, _chs, _cvs, _tq in comps:
            ta = 0 if cid == 1 else 1
            scan = [(cid, 0, ta)]
            parts.append(sos(scan, 1, 63, 0, 1))
            se = _ScanEncoder(scan)
            bh, bw = _comp_block_dims(frame, cid)
            for by in range(bh):
                for bx in range(bw):
                    _encode_ac_band(
                        se.enc, se.ac_stats[ta], se.fixed,
                        buffers[cid][by, bx], AC_DEFAULT, 1, 63, 1,
                    )
            parts.append(se.finish())

        # ---- DC refine (ah=1, al=0), interleaved ----
        parts.append(sos(full_scan, 0, 0, 1, 0))
        se = _ScanEncoder(full_scan)
        for my in range(mcuy):
            for mx in range(mcux):
                for cid, chs, cvs, _tq in comps:
                    for by in range(cvs):
                        for bx in range(chs):
                            bit = int(buffers[cid][my * cvs + by,
                                                   mx * chs + bx, 0]) & 1
                            se.enc.encode(se.fixed, 0, bit)
        parts.append(se.finish())

        # ---- AC refine (ah=1, al=0) per component ----
        for cid, _chs, _cvs, _tq in comps:
            ta = 0 if cid == 1 else 1
            scan = [(cid, 0, ta)]
            parts.append(sos(scan, 1, 63, 1, 0))
            se = _ScanEncoder(scan)
            bh, bw = _comp_block_dims(frame, cid)
            for by in range(bh):
                for bx in range(bw):
                    _encode_ac_refine_block(
                        se.enc, se.ac_stats[ta], se.fixed,
                        buffers[cid][by, bx], 1, 63, 0,
                    )
            parts.append(se.finish())

    parts.append(b"\xff\xd9")
    return b"".join(parts)
