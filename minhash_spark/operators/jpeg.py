"""Pure-numpy JPEG (ITU T.81) codec — no external codec libraries (this
environment has neither Pillow nor ffmpeg).

Decoder: baseline (SOF0/SOF1) and progressive (SOF2) Huffman JPEG — 1- or
3-component frames, arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0),
per-file quantization + Huffman tables (read from DQT/DHT, never assumed),
restart markers, 0xFF00 byte stuffing. All scans decode into a shared
coefficient store (spectral-selection bands and successive-approximation
DC/AC first + refinement passes per T.81 Annex G), and dequantize + IDCT
run once at end-of-image; sequential non-interleaved multi-scan files ride
the same path. Arithmetic coding, hierarchical frames and 12-bit precision
raise NotImplementedError — honestly out of scope, not faked.

Encoders: minimal grayscale baseline + progressive writers used to build
deterministic test vectors (standard Annex-K luminance tables). Because the
decoder reads its tables from the file, encode→decode round-trip tests
validate the whole bitstream path end-to-end with no external ground truth
needed; with an all-ones quantization table, block-constant images
round-trip EXACTLY (every AC coefficient is zero and the DC term is
integral), which pins correctness deterministically — and a progressive
encode of ANY image must decode to the byte-identical pixels of its
baseline encode (same quantized coefficients, transported losslessly across
scans), which pins the whole progressive scan machinery against the
already-oracled baseline path.

This is the `decode_media("jpeg")` backend for the multimodal column
operators (operators/multimodal.py): decoding runs inside mapInPandas, so
per-image Python cost is Arrow-batched like every other media parser here.
It is a correctness/plumbing decoder, not a SIMD race — swap in a native
codec where available.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# shared constants
# --------------------------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    """Indices (row-major) of the 64 block positions in zigzag scan order."""
    coords = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
    )
    return np.array([r * 8 + c for r, c in coords], dtype=np.int64)


ZIGZAG = _zigzag_order()

# DCT-II basis matrix of the JPEG FDCT/IDCT: M[u, x] = 0.5·C(u)·cos((2x+1)uπ/16)
_DCT_M = np.array(
    [
        [
            0.5 * (1 / np.sqrt(2) if u == 0 else 1.0) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Annex K.1 luminance quantization table (zigzag order NOT applied — row-major)
STD_LUMA_QUANT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 luminance Huffman specs: (BITS[1..16], HUFFVAL)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol map from a DHT BITS/HUFFVAL spec
    (T.81 Annex C code assignment)."""
    codes: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return codes


def _encode_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, code_length), the encoder-side view."""
    return {sym: (code, length) for (length, code), sym in _canonical_codes(bits, huffval).items()}


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops cleanly at markers (restart handling is the caller's)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # past end: feed 1-padding (spec-conformant filler)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker: stop producing data, pad with 1s
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop buffered bits and return the next marker byte (after 0xFF),
        advancing past it. Returns None at end of data."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                marker = self.data[self.pos + 1]
                self.pos += 2
                return marker
            self.pos += 1
        return None


def _decode_huff(reader: _BitReader, codes: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = codes.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude field to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block_seq(reader, blk, dc_pred, cs, huff_dc_t, huff_ac_t) -> None:
    """Sequential full-band block decode (T.81 F.2.2) into zigzag-order
    int64 view `blk`."""
    s = _decode_huff(reader, huff_dc_t)
    dc_pred[cs] += _extend(reader.read_bits(s), s)
    blk[0] = dc_pred[cs]
    k = 1
    while k < 64:
        rs = _decode_huff(reader, huff_ac_t)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(reader.read_bits(size), size)
        k += 1


def _decode_block_ac_first(reader, blk, huff_ac_t, ss, se, al, eobrun) -> None:
    """Progressive AC first scan for one block (T.81 G.2.2): spectral band
    [ss, se], values shifted left by the point transform, EOB runs counted
    in `eobrun` (1-element list, scan-level state)."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(reader, huff_ac_t)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r < 15:  # EOBn: this block done, next 2^r−1+ext blocks zero
                eobrun[0] = (1 << r) - 1
                if r:
                    eobrun[0] += reader.read_bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past end of spectral band")
        blk[k] = _extend(reader.read_bits(size), size) << al
        k += 1


def _decode_block_ac_refine(reader, blk, huff_ac_t, ss, se, al, eobrun) -> None:
    """Progressive AC refinement for one block (T.81 G.2.2 / libjpeg
    decode_mcu_AC_refine shape): newly-nonzero coefficients arrive as ±1<<al
    with a sign bit; every already-nonzero coefficient passed on the way
    consumes one correction bit."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k_pos: int) -> None:
        if reader.read_bit() and (int(blk[k_pos]) & p1) == 0:
            blk[k_pos] += p1 if blk[k_pos] > 0 else m1

    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = _decode_huff(reader, huff_ac_t)
            r, size = rs >> 4, rs & 0x0F
            newval = 0
            if size == 0:
                if r < 15:  # EOBn covers THIS block's tail via the branch below
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.read_bits(r)
                    break
                # ZRL: r stays 15 → skip 16 zero-history coefficients
            else:
                if size != 1:
                    raise ValueError("AC refinement magnitude must be 1")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun[0] -= 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline or progressive Huffman JPEG. Returns uint8 (h, w)
    for grayscale or (h, w, 3) RGB for 3-component YCbCr images.

    Every scan (sequential interleaved or not; progressive DC/AC first or
    refinement) accumulates into per-component zigzag-order coefficient
    stores; dequantization + IDCT happen once at end of image, so scan
    count and ordering never change the output."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG payload (missing SOI)")

    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)], progressive)
    restart_interval = 0
    coeffs: dict[int, np.ndarray] = {}  # cid → (blocks_y, blocks_x, 64) zigzag
    saw_scan = False

    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST between scans
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg, dtype=">u2", count=64, offset=p).astype(np.int64)
                    p += 128
                dezig = np.empty(64, dtype=np.int64)
                dezig[ZIGZAG] = tbl
                quant[tq] = dezig.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may also appear between scans)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _canonical_codes(bits, huffval)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit precision unsupported")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for cid, hs, vs, _tq in comps:
                coeffs[cid] = np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only Huffman baseline (SOF0/SOF1) and progressive (SOF2) "
                "JPEG are supported — lossless/arithmetic/hierarchical "
                "frames need an external codec"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            h, w, comps, progressive = frame
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                sel.append((cs, tda >> 4, tda & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            reader = _BitReader(data, pos + 2 + seg_len)
            _decode_scan(
                reader, sel, comps, coeffs, huff_dc, huff_ac,
                ss, se, ah, al, restart_interval, h, w,
            )
            saw_scan = True
            # resume the marker walk at the first non-RST marker after the
            # entropy-coded data
            p = reader.pos
            while p + 1 < len(data):
                if data[p] == 0xFF and data[p + 1] != 0x00 and not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    break
                p += 1
            pos = p
            continue
        # APPn/COM/others: skip
        pos += 2 + seg_len

    if frame is None:
        raise ValueError("JPEG missing SOF")
    if not saw_scan:
        raise ValueError("JPEG missing SOS")
    h, w, comps, _progressive = frame

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    out_planes = []
    for cid, hs, vs, tq in comps:
        blocks = coeffs[cid]  # (by, bx, 64) zigzag order
        nby, nbx = blocks.shape[:2]
        dezig = np.zeros((nby, nbx, 64), dtype=np.int64)
        dezig[:, :, ZIGZAG] = blocks
        f = dezig.reshape(nby, nbx, 8, 8) * quant[tq][None, None]
        # IDCT all blocks at once: pix = Mᵀ·F·M per block
        pix = np.einsum("ux,nmuv,vy->nmxy", _DCT_M, f.astype(np.float64), _DCT_M)
        plane = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# kept name: the multimodal operators call decode_baseline; it now also
# decodes progressive (SOF2) files through the same entry point
decode_baseline = decode_jpeg


def _decode_scan(
    reader: _BitReader,
    sel: list[tuple[int, int, int]],
    comps: list[tuple[int, int, int, int]],
    coeffs: dict[int, np.ndarray],
    huff_dc: dict[int, dict],
    huff_ac: dict[int, dict],
    ss: int, se: int, ah: int, al: int,
    restart_interval: int,
    h: int, w: int,
) -> None:
    """Decode one entropy-coded scan into the coefficient stores. Handles
    all four progressive scan kinds (DC/AC × first/refinement) plus
    sequential full-band scans (ss=0, se=63, ah=0), interleaved (ns > 1,
    MCU order) or single-component (raster order over that component's
    non-interleaved block grid)."""
    comp_by_id = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    if ss > 0 and len(sel) != 1:
        raise ValueError("AC scans must be single-component")

    dc_pred = {cs: 0 for cs, *_ in sel}
    eobrun = [0]
    mcu_index = 0

    def maybe_restart() -> None:
        nonlocal dc_pred
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            marker = reader.align_to_marker()
            if marker is None or not (0xD0 <= marker <= 0xD7):
                raise ValueError("expected restart marker")
            dc_pred = {cs: 0 for cs in dc_pred}
            eobrun[0] = 0

    def decode_one(cs: int, td: int, ta: int, by: int, bx: int) -> None:
        blk = coeffs[cs][by, bx]
        if ss == 0 and se == 63:  # sequential full band
            _decode_block_seq(reader, blk, dc_pred, cs, huff_dc[td], huff_ac[ta])
        elif ss == 0:  # progressive DC (se must be 0)
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            if ah == 0:
                s = _decode_huff(reader, huff_dc[td])
                dc_pred[cs] += _extend(reader.read_bits(s), s)
                blk[0] = dc_pred[cs] << al
            else:
                if reader.read_bit():
                    blk[0] = int(blk[0]) | (1 << al)
        elif ah == 0:
            _decode_block_ac_first(reader, blk, huff_ac[ta], ss, se, al, eobrun)
        else:
            _decode_block_ac_refine(reader, blk, huff_ac[ta], ss, se, al, eobrun)

    if len(sel) > 1:  # interleaved MCU order (DC or sequential scans)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for cs, td, ta in sel:
                    _, hs, vs, _tq = comp_by_id[cs]
                    for by in range(vs):
                        for bx in range(hs):
                            decode_one(cs, td, ta, my * vs + by, mx * hs + bx)
                mcu_index += 1
    else:  # single component: raster over its non-interleaved block grid
        cs, td, ta = sel[0]
        _, hs, vs, _tq = comp_by_id[cs]
        # component dims: ceil(w·hs/hmax) samples wide, ceil(h·vs/vmax) tall
        nbx = (-(-w * hs // hmax) + 7) // 8
        nby = (-(-h * vs // vmax) + 7) // 8
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                decode_one(cs, td, ta, by, bx)
                mcu_index += 1


# --------------------------------------------------------------------------
# minimal grayscale encoder (test-vector generator)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> bytes:
        if self.nacc:
            self.acc = (self.acc << (8 - self.nacc)) | ((1 << (8 - self.nacc)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nacc = 0
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category s, s-bit field) for a signed coefficient (T.81 F.1.2.1)."""
    s = int(abs(v)).bit_length()
    field = v if v >= 0 else v + (1 << s) - 1
    return s, field


def encode_gray_baseline(img: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Encode a uint8 grayscale image as a baseline JPEG using the standard
    Annex-K luminance tables (pass `quant=np.ones((8,8))` for near-lossless
    test vectors: block-constant inputs then round-trip exactly)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_gray_baseline expects a 2-D grayscale array")
    h, w = img.shape
    q = (STD_LUMA_QUANT.reshape(8, 8) if quant is None else np.asarray(quant, dtype=np.int64))
    if q.shape != (8, 8) or (q < 1).any():
        raise ValueError("quant table must be 8x8 with entries >= 1")

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)

    dc_codes = _encode_codes(*STD_DC_LUMA)
    ac_codes = _encode_codes(*STD_AC_LUMA)
    writer = _BitWriter()
    dc_prev = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            dc_prev = _encode_block(writer, block, q, dc_prev, dc_codes, ac_codes)
    entropy = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zig_q = q.reshape(-1)[ZIGZAG]  # store in zigzag order, 8-bit precision
    dqt = seg(0xDB, bytes([0x00]) + bytes(int(x) for x in zig_q))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(STD_DC_LUMA[0]) + bytes(STD_DC_LUMA[1]))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(STD_AC_LUMA[0]) + bytes(STD_AC_LUMA[1]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"
    )


def _encode_block(writer: _BitWriter, block: np.ndarray, q: np.ndarray,
                  dc_prev: int, dc_codes: dict, ac_codes: dict) -> int:
    """FDCT + quantize + entropy-code one 8×8 block; returns the new DC
    predictor."""
    f = _DCT_M @ (block - 128.0) @ _DCT_M.T
    coeffs = np.round(f / q).astype(np.int64).reshape(-1)[ZIGZAG]
    s, field = _magnitude(int(coeffs[0]) - dc_prev)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(field, s)
    run = 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        s, field = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(field, s)
        run = 0
    if run:
        code, length = ac_codes[0x00]
        writer.write(code, length)
    return int(coeffs[0])


def encode_rgb_baseline(img: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Encode a uint8 (h, w, 3) RGB image as a 4:4:4 baseline JPEG (one
    interleaved scan, luminance tables shared by all components) — exercises
    the decoder's 3-component + YCbCr path with self-generated vectors."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_rgb_baseline expects (h, w, 3) RGB")
    h, w = img.shape[:2]
    q = (STD_LUMA_QUANT.reshape(8, 8) if quant is None else np.asarray(quant, dtype=np.int64))

    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in (y, cb, cr)
    ]

    dc_codes = _encode_codes(*STD_DC_LUMA)
    ac_codes = _encode_codes(*STD_AC_LUMA)
    writer = _BitWriter()
    dc_prev = [0, 0, 0]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for c in range(3):
                block = planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                dc_prev[c] = _encode_block(
                    writer, block, q, dc_prev[c], dc_codes, ac_codes
                )
    entropy = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zig_q = q.reshape(-1)[ZIGZAG]
    dqt = seg(0xDB, bytes([0x00]) + bytes(int(x) for x in zig_q))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(STD_DC_LUMA[0]) + bytes(STD_DC_LUMA[1]))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(STD_AC_LUMA[0]) + bytes(STD_AC_LUMA[1]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"


# --------------------------------------------------------------------------
# progressive grayscale encoder (test-vector generator for the SOF2 path)
# --------------------------------------------------------------------------

# AC Huffman table for progressive scans: all 256 symbols, canonical codes
# at lengths 9/10. The standard Annex-K AC table cannot serve here — it has
# no EOBn symbols ((r<<4)|0 for r in 1..14), which only exist in
# progressive mode. 255 symbols at length 9 + 1 at length 10 keeps every
# code under the all-ones pattern of its length (T.81 C.2).
PROG_AC_HUFF = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


def _block_coeffs(padded: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize every 8×8 block of an already-padded float image →
    (nby, nbx, 64) int64 in ZIGZAG order (level-shifted by −128 first).

    Deliberately the same per-block matmul expression as _encode_block: a
    batched einsum sums in a different order, and a coefficient sitting on
    an exact .5 can round differently — which would make progressive and
    baseline encodings of the same image carry different coefficients and
    break the decode-identical test pin."""
    nby, nbx = padded.shape[0] // 8, padded.shape[1] // 8
    out = np.empty((nby, nbx, 64), dtype=np.int64)
    for by in range(nby):
        for bx in range(nbx):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            f = _DCT_M @ (block - 128.0) @ _DCT_M.T
            out[by, bx] = np.round(f / q).astype(np.int64).reshape(-1)[ZIGZAG]
    return out


def _emit_dc_first(writer: _BitWriter, blocks: np.ndarray, dc_codes: dict, al: int) -> None:
    prev = 0
    for blk in blocks:
        v = int(blk[0]) >> al  # DC point transform: arithmetic shift
        s, field = _magnitude(v - prev)
        prev = v
        code, ln = dc_codes[s]
        writer.write(code, ln)
        if s:
            writer.write(field, s)


def _emit_dc_refine(writer: _BitWriter, blocks: np.ndarray, al: int) -> None:
    for blk in blocks:
        writer.write((int(blk[0]) >> al) & 1, 1)


def _flush_eobrun(writer: _BitWriter, ac_codes: dict, eobrun: int, be_bits: list[int]) -> None:
    """Emit a pending EOBn symbol (+ its extension bits) followed by the
    correction bits folded into the run (refinement scans only)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = ac_codes[nbits << 4]
        writer.write(code, ln)
        if nbits:
            writer.write(eobrun - (1 << nbits), nbits)
        for b in be_bits:
            writer.write(b, 1)


def _emit_ac_first(
    writer: _BitWriter, blocks: np.ndarray, ac_codes: dict, ss: int, se: int, al: int
) -> None:
    """Progressive AC first scan (T.81 G.1.2.2): spectral band [ss, se],
    point transform = magnitude shift toward zero, cross-block EOB runs."""
    eobrun = 0
    for blk in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            _flush_eobrun(writer, ac_codes, eobrun, [])
            eobrun = 0
            while r > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                writer.write(code, ln)
                r -= 16
            s, field = _magnitude(t if v > 0 else -t)
            code, ln = ac_codes[(r << 4) | s]
            writer.write(code, ln)
            writer.write(field, s)
            r = 0
        if r > 0:  # band ended in zeros → this block closes with an EOB
            eobrun += 1
            if eobrun == 0x7FFF:
                _flush_eobrun(writer, ac_codes, eobrun, [])
                eobrun = 0
    _flush_eobrun(writer, ac_codes, eobrun, [])


def _emit_ac_refine(
    writer: _BitWriter, blocks: np.ndarray, ac_codes: dict, ss: int, se: int, al: int
) -> None:
    """Progressive AC refinement scan (T.81 G.1.2.3, the jcphuff
    encode_mcu_AC_refine shape): newly-nonzero coefficients emit
    (run<<4)|1 + sign; already-nonzero coefficients contribute one
    correction bit each, buffered so the decoder meets them in the order
    its run-advance loop consumes them."""
    eobrun = 0
    be_bits: list[int] = []  # correction bits folded into the pending EOB run
    for blk in blocks:
        band = [int(blk[k]) for k in range(ss, se + 1)]
        absv = [abs(v) >> al for v in band]
        # index (relative) of the last NEWLY-nonzero coefficient: runs of
        # zeros past it fold into the EOB run instead of ZRLs
        eob_rel = -1
        for i, t in enumerate(absv):
            if t == 1:
                eob_rel = i
        r = 0
        br: list[int] = []  # correction bits since the last emitted symbol
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob_rel:
                _flush_eobrun(writer, ac_codes, eobrun, be_bits)
                eobrun, be_bits = 0, []
                code, ln = ac_codes[0xF0]
                writer.write(code, ln)
                r -= 16
                for b in br:
                    writer.write(b, 1)
                br = []
            if t > 1:  # nonzero history: next bit of the magnitude
                br.append(t & 1)
                continue
            # newly nonzero (t == 1): symbol + sign, then the buffered bits
            _flush_eobrun(writer, ac_codes, eobrun, be_bits)
            eobrun, be_bits = 0, []
            code, ln = ac_codes[(r << 4) | 1]
            writer.write(code, ln)
            writer.write(1 if band[i] > 0 else 0, 1)
            for b in br:
                writer.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be_bits.extend(br)
            if eobrun == 0x7FFF:
                _flush_eobrun(writer, ac_codes, eobrun, be_bits)
                eobrun, be_bits = 0, []
    _flush_eobrun(writer, ac_codes, eobrun, be_bits)


def encode_gray_progressive(
    img: np.ndarray, quant: np.ndarray | None = None, al: int = 1
) -> bytes:
    """Encode a uint8 grayscale image as a progressive (SOF2) JPEG.

    al=1 (default) exercises the full Annex-G surface in six scans:
    DC first (Al=1) → DC refinement → AC first over two spectral bands
    (1..5, 6..63, both at Al=1) → AC refinement of both bands. al=0 emits
    spectral selection only (three scans, no successive approximation).
    The quantized coefficients are identical to encode_gray_baseline's, so
    decode_jpeg(progressive) must equal decode_jpeg(baseline) pixel-exactly
    for the same image/quant — the round-trip oracle the tests pin."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_gray_progressive expects a 2-D grayscale array")
    if al not in (0, 1):
        raise ValueError("al must be 0 or 1")
    h, w = img.shape
    q = (STD_LUMA_QUANT.reshape(8, 8) if quant is None else np.asarray(quant, dtype=np.int64))
    if q.shape != (8, 8) or (q < 1).any():
        raise ValueError("quant table must be 8x8 with entries >= 1")

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
    blocks = _block_coeffs(padded, q).reshape(-1, 64)  # raster block order

    dc_codes = _encode_codes(*STD_DC_LUMA)
    ac_codes = _encode_codes(*PROG_AC_HUFF)

    def entropy(emit) -> bytes:
        writer = _BitWriter()
        emit(writer)
        return writer.flush()

    bands = [(1, 5), (6, 63)]
    scans: list[tuple[int, int, int, int, bytes]] = []  # (ss, se, ah, al, data)
    scans.append((0, 0, 0, al, entropy(lambda W: _emit_dc_first(W, blocks, dc_codes, al))))
    if al:
        scans.append((0, 0, al, al - 1, entropy(lambda W: _emit_dc_refine(W, blocks, al - 1))))
    for bs, be in bands:
        scans.append(
            (bs, be, 0, al,
             entropy(lambda W, bs=bs, be=be: _emit_ac_first(W, blocks, ac_codes, bs, be, al)))
        )
    if al:
        for bs, be in bands:
            scans.append(
                (bs, be, al, al - 1,
                 entropy(lambda W, bs=bs, be=be: _emit_ac_refine(W, blocks, ac_codes, bs, be, al - 1)))
            )

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zig_q = q.reshape(-1)[ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in zig_q))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(STD_DC_LUMA[0]) + bytes(STD_DC_LUMA[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(PROG_AC_HUFF[0]) + bytes(PROG_AC_HUFF[1]))
    for ss, se, ah, a, data in scans:
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | a]))
        out += data
    out += b"\xff\xd9"
    return bytes(out)
