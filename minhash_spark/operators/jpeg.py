"""Pure-numpy baseline JPEG (ITU T.81 SOF0) codec — no external codec
libraries (this environment has neither Pillow nor ffmpeg).

Decoder: full baseline support — 1- or 3-component scans, arbitrary
sampling factors (4:4:4 / 4:2:2 / 4:2:0), per-file quantization + Huffman
tables (read from DQT/DHT, never assumed), restart markers, 0xFF00 byte
stuffing. Progressive (SOF2) and arithmetic coding raise
NotImplementedError — honestly out of scope, not faked.

Encoder: minimal grayscale baseline writer used to build deterministic test
vectors (standard Annex-K luminance tables). Because the decoder reads its
tables from the file, encode→decode round-trip tests validate the whole
bitstream path end-to-end with no external ground truth needed; with an
all-ones quantization table, block-constant images round-trip EXACTLY
(every AC coefficient is zero and the DC term is integral), which pins
correctness deterministically.

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


def decode_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG. Returns uint8 (h, w) for grayscale or
    (h, w, 3) RGB for 3-component YCbCr images."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG payload (missing SOI)")

    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    scan = None  # ([(cid, td, ta)], data_start)
    restart_interval = 0

    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
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
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _canonical_codes(bits, huffval)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit precision unsupported")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) JPEG is supported — progressive/"
                "arithmetic/hierarchical frames need an external codec"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                sel.append((cs, tda >> 4, tda & 0x0F))
            scan = (sel, pos + 2 + seg_len)
            break
        # APPn/COM/others: skip
        pos += 2 + seg_len

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame
    sel, data_start = scan
    if len(sel) != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) baseline unsupported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component block planes
    planes = {}
    comp_by_id = {c[0]: c for c in comps}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)

    reader = _BitReader(data, data_start)
    dc_pred = {cid: 0 for cid, *_ in comps}
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                marker = reader.align_to_marker()
                if marker is None or not (0xD0 <= marker <= 0xD7):
                    raise ValueError("expected restart marker")
                dc_pred = {cid: 0 for cid in dc_pred}
            for cs, td, ta in sel:
                _, hs, vs, tq = comp_by_id[cs]
                q = quant[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coeffs = np.zeros(64, dtype=np.int64)
                        s = _decode_huff(reader, huff_dc[td])
                        diff = _extend(reader.read_bits(s), s)
                        dc_pred[cs] += diff
                        coeffs[0] = dc_pred[cs]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, huff_ac[ta])
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            coeffs[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        block = np.empty(64, dtype=np.int64)
                        block[ZIGZAG] = coeffs
                        f = block.reshape(8, 8) * q
                        pix = _DCT_M.T @ f @ _DCT_M + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_index += 1

    # upsample to full resolution and crop
    out_planes = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])

    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


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
