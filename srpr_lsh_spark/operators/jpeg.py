"""Baseline JPEG (ITU-T T.81) codec in pure numpy — no image library.

Why this exists: JPEG is the dominant still-image format of any web-scale
training corpus, and this container ships no pillow/opencv. The decode
boundary in ``operators/multimodal.py`` previously raised for it; this
module implements baseline sequential JPEG for real:

- decoder: SOI/APPn/COM/DQT/DRI/SOF0/DHT/SOS parsing, byte-stuffed entropy
  stream with restart markers, canonical Huffman decoding, dequantize +
  dezigzag, exact float 8×8 IDCT (DCT-matrix multiply), chroma upsampling
  for any (h, v) sampling factors, JFIF full-range YCbCr→RGB;
- encoder (for tests + synth corpora): 4:4:4 or 4:2:0, Annex-K quantization
  tables with libjpeg-style quality scaling, the T.81 Annex-K default
  Huffman tables.

Correctness is pinned by round-trip PSNR tests (lossy codec — exactness is
not defined) plus structural tests: grayscale, 4:2:0, restart intervals.

Performance note: Huffman entropy decoding is inherently bit-serial; this
implementation decodes per-block in Python and is meant for correctness and
moderate volumes. At 100-TB scale you would plug a native decoder at the
same ``decode_image`` boundary — every downstream stage (features, schema,
batching) is unchanged, which is the point of the boundary.
"""

from __future__ import annotations

import struct

import numpy as np

# --- zigzag order (T.81 Figure A.6) ---
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# --- Annex K quantization tables ---
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# --- Annex K default Huffman tables: (BITS[1..16], HUFFVAL) ---
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
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
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# 8-point DCT-II orthonormal matrix: IDCT(block) = C.T @ block @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16.0) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def idct2(block: np.ndarray) -> np.ndarray:
    """Exact float 2-D inverse DCT of one 8×8 coefficient block."""
    return _C.T @ block @ _C


def dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _HuffTable:
    """Canonical Huffman table from (BITS, HUFFVAL) — T.81 Annex C."""

    def __init__(self, bits, vals):
        self.lookup = {}
        code = 0
        k = 0
        self.maxlen = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
                self.maxlen = length
            code <<= 1
        # encoder side: symbol → (code, length)
        self.encode = {v: (c, l) for (l, c), v in self.lookup.items()}


class _BitReader:
    """MSB-first reader over the entropy-coded segment: un-stuffs 0xFF00 and
    stops (resyncs) at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker: feed zero bits (decoder drains before resync)
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Skip to just past the next marker (RSTn) — restart handling."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                self.pos += 2
                return
            self.pos += 1

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: t-bit magnitude → signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline sequential JPEG → (H, W, 3) uint8 RGB (grayscale replicated)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    restart_interval = 0
    frame = None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        body = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq:
                    qtables[tq] = np.frombuffer(
                        body[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                else:
                    qtables[tq] = np.frombuffer(
                        body[p : p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                htables[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if precision != 8:
                raise ValueError("only 8-bit precision JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential (SOF0) supported"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            pos += seglen
            return _decode_scan(
                blob, pos, frame, scan, qtables, htables, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS in JPEG")


def _decode_scan(blob, pos, frame, scan, qtables, htables, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for comp, _td, _ta in scan:
        pw, ph = mcux * 8 * comp["h"], mcuy * 8 * comp["v"]
        planes[comp["id"]] = np.zeros((ph, pw), dtype=np.float64)

    br = _BitReader(blob, pos)
    pred = {comp["id"]: 0 for comp, _t, _a in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_to_marker()
                pred = {k: 0 for k in pred}
            for comp, td, ta in scan:
                dct_t, act = htables[(0, td)], htables[(1, ta)]
                q = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = br.decode_huff(dct_t)
                        diff = _extend(br.receive(t), t)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        px = idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    # upsample to full resolution and convert
    full = []
    for comp, _td, _ta in scan:
        p = planes[comp["id"]]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder (tests + synthetic corpora)
# --------------------------------------------------------------------------

def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s


def _encode_block(bw, block, q, dct_t, act, pred):
    coef = np.round(dct2(block - 128.0) / q.reshape(8, 8)).astype(np.int64)
    zz = coef.reshape(64)[ZIGZAG]  # natural → zigzag (zz[i] = nat[ZIGZAG[i]])
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    t = int(diff).bit_length() if diff != 0 else 0
    code, ln = dct_t.encode[t]
    bw.write(code, ln)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        bw.write(v & ((1 << t) - 1), t)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if last_nz.size else 0
    for k in range(1, 64):
        if k > last:
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l_ = act.encode[0xF0]
            bw.write(c, l_)
            run -= 16
        s = abs(v).bit_length()
        c, l_ = act.encode[(run << 4) | s]
        bw.write(c, l_)
        vv = v if v > 0 else v + (1 << s) - 1
        bw.write(vv & ((1 << s) - 1), s)
        run = 0
    if last < 63:
        c, l_ = act.encode[0x00]
        bw.write(c, l_)
    return pred


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) or (H, W) uint8 → baseline JPEG. ``subsample=True`` → 4:2:0;
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs."""
    gray = img.ndim == 2
    if gray:
        img = img[:, :, None]
    h, w, _c = img.shape
    # Annex-K tables are NATURAL (row-major) order; the DQT segment carries
    # them in ZIGZAG order (what the decoder scatters back through ZIGZAG)
    ql_nat = _quality_scale(QUANT_LUM, quality)
    qc_nat = _quality_scale(QUANT_CHROMA, quality)
    ql_zz = ql_nat[ZIGZAG]
    qc_zz = qc_nat[ZIGZAG]

    dc_l = _HuffTable(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _HuffTable(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _HuffTable(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _HuffTable(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        y = img[:, :, 0].astype(np.float64)
        comps = [("Y", y, ql_nat, dc_l, ac_l, 1, 1)]
        sof_comps = [(1, 1, 1, 0)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even then 2×2 box average
            he, we = (h + 1) & ~1, (w + 1) & ~1
            def pad(p):
                return np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
            cb = pad(cb).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            comps = [("Y", y, ql_nat, dc_l, ac_l, 2, 2),
                     ("Cb", cb, qc_nat, dc_c, ac_c, 1, 1),
                     ("Cr", cr, qc_nat, dc_c, ac_c, 1, 1)]
            sof_comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            comps = [("Y", y, ql_nat, dc_l, ac_l, 1, 1),
                     ("Cb", cb, qc_nat, dc_c, ac_c, 1, 1),
                     ("Cr", cr, qc_nat, dc_c, ac_c, 1, 1)]
            sof_comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]

    hmax = max(c[5] for c in comps)
    vmax = max(c[6] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    padded = []
    for _name, plane, qn, dt, at, ch, cv in comps:
        pw, ph_ = mcux * 8 * ch, mcuy * 8 * cv
        p = np.pad(
            plane,
            ((0, ph_ - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        padded.append((p, qn, dt, at, ch, cv))

    bw = _BitWriter()
    preds = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (p, qn, dt, at, ch, cv) in enumerate(padded):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        preds[ci] = _encode_block(
                            bw, p[y0 : y0 + 8, x0 : x0 + 8], qn, dt, at, preds[ci]
                        )
            mcu_count += 1
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid, zz_table):
        return seg(0xDB, bytes([tid]) + bytes(int(v) for v in zz_table))

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = [b"\xff\xd8"]
    out.append(dqt(0, ql_zz))
    if not gray:
        out.append(dqt(1, qc_zz))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(sof_comps)])
    for cid, ch, cv, tq in sof_comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out.append(seg(0xC0, sof))
    out.append(dht(0, 0, DC_LUM_BITS, DC_LUM_VALS))
    out.append(dht(1, 0, AC_LUM_BITS, AC_LUM_VALS))
    if not gray:
        out.append(dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out.append(dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([len(sof_comps)])
    for i, (cid, _ch, _cv, tq) in enumerate(sof_comps):
        td_ta = 0x00 if i == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out.append(seg(0xDA, sos))
    out.append(bytes(bw.out))
    out.append(b"\xff\xd9")
    return b"".join(out)
