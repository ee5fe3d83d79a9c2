"""Baseline JPEG codec, pure Python, stdlib-only.

Completes the multimodal content-decode tier: PNG pixels (zlib +
unfilter), GIF pixels (LZW + palette), and now JPEG pixels — full
baseline sequential decoding (DQT/DHT/SOF0/SOS parse, byte-unstuffed
Huffman entropy decode, dequantization, 2-D IDCT, chroma upsampling,
YCbCr→RGB), plus the matching encoder the roundtrip tests pin against.

Scope (honest subset):
* decoder: baseline DCT (SOF0), 8-bit, any number of components with
  arbitrary sampling factors (nearest-neighbor chroma upsample),
  restart markers honored.  Progressive (SOF2) and arithmetic coding
  return None — the caller's tiered dispatch falls back to the header
  parser / PIL.
* encoder: 4:4:4 (no subsampling), grayscale or YCbCr, custom
  CANONICAL Huffman tables carried in DHT (fixed-length code books —
  spec-valid, self-describing, and free of any memorized standard
  table), quality via one uniform quantization table.

JPEG is lossy by design: the roundtrip contract is bounded error
(quant=1 keeps max|err| within a few counts from DCT rounding), which
the tests assert, unlike the byte-exact PNG/GIF/WAV pins.

Scale shape: this runs inside the same Arrow-batched mapInPandas
stages as the other decoders — per-blob work, no shuffle.  Pure-Python
DCT math is the correctness reference; a production deployment drops
PIL/libjpeg into the import-gated tier above it for throughput.
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

#: zig-zag scan order: zigzag[i] = (row, col) of the i-th coefficient
ZIGZAG: list[tuple[int, int]] = []
_r = _c = 0
for _i in range(64):
    ZIGZAG.append((_r, _c))
    if (_r + _c) % 2 == 0:  # moving up-right
        if _c == 7:
            _r += 1
        elif _r == 0:
            _c += 1
        else:
            _r -= 1
            _c += 1
    else:  # moving down-left
        if _r == 7:
            _c += 1
        elif _c == 0:
            _r += 1
        else:
            _r += 1
            _c -= 1
del _r, _c, _i

#: orthonormal 8-point DCT basis: _COS[u][x] = c(u)/2 * cos((2x+1)u*pi/16)
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) / 2.0
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _fdct2d(block: list[list[float]]) -> list[list[float]]:
    """2-D type-II DCT of an 8x8 block (separable).  The orthonormal
    basis above IS the JPEG normalization: (1/4)c(u)c(v) double-sum ==
    C f C^T with C[u][x] = alpha(u) cos((2x+1)u*pi/16)."""
    tmp = [[sum(_COS[u][x] * block[y][x] for x in range(8)) for u in range(8)] for y in range(8)]
    return [
        [sum(_COS[v][y] * tmp[y][u] for y in range(8)) for u in range(8)]
        for v in range(8)
    ]


def _idct2d(coef: list[list[float]]) -> list[list[float]]:
    """2-D inverse DCT of an 8x8 coefficient block."""
    tmp = [[sum(_COS[u][x] * coef[v][u] for u in range(8)) for x in range(8)] for v in range(8)]
    return [
        [sum(_COS[v][y] * tmp[v][x] for v in range(8)) for x in range(8)]
        for y in range(8)
    ]


def _bit_size(v: int) -> int:
    """JPEG magnitude category: number of bits to represent |v|."""
    return v.bit_length() if v >= 0 else (-v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

#: fixed-length canonical code books shipped in DHT: 12 DC size
#: categories at 4 bits; AC symbols 0x00-0xFE at 9 bits (canonical code
#: == symbol value) with 0xFF — (15,15), never emitted by a baseline
#: encoder — parked at 10 bits because a DHT BITS byte caps at 255
#: codes per length.  Both books leave the all-ones code unused as the
#: spec requires; any conforming decoder reads them from the stream.
_DC_BITS = [0] * 3 + [12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
_AC_VALS = list(range(255)) + [255]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = self.nbits = 0
        return bytes(self.out)


def _encode_block(bw: _BitWriter, block: list[int], dc_pred: int) -> int:
    """Huffman-encode one zigzagged, quantized 8x8 block; returns the
    new DC predictor.  Codes are the fixed-length canonical books."""
    dc = block[0]
    diff = dc - dc_pred
    size = _bit_size(diff)
    bw.write(size, 4)  # DC symbol `size` = canonical code `size` at 4 bits
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if block[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = block[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(0xF0, 9)  # ZRL
            run -= 16
        size = _bit_size(v)
        bw.write((run << 4) | size, 9)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz != 63:
        bw.write(0x00, 9)  # EOB
    return dc


def encode_jpeg(
    pixels: bytes, width: int, height: int, channels: int = 1, quant: int = 1
) -> bytes:
    """Baseline JPEG encoder (4:4:4, 8-bit, gray or RGB): a complete,
    spec-valid JFIF-less stream — SOI, DQT, SOF0, DHT (self-describing
    canonical tables), SOS, byte-stuffed entropy data, EOI.  ``quant``
    is the single uniform quantization step (1 = near-lossless within
    DCT rounding)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (rgb)")
    # color convert to the coded planes
    n = width * height
    if channels == 1:
        planes = [[float(pixels[i]) for i in range(n)]]
    else:
        y_p, cb_p, cr_p = [], [], []
        for i in range(n):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            y_p.append(0.299 * r + 0.587 * g + 0.114 * b)
            cb_p.append(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
            cr_p.append(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        planes = [y_p, cb_p, cr_p]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: one 8-bit table, id 0, uniform step
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([quant] * 64)
    # SOF0
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for cid in range(ncomp):
        out += bytes([cid + 1, 0x11, 0])  # 1x1 sampling, qtable 0
    # DHT: DC table 0 + AC table 0
    dht = bytes([0x00]) + bytes(_DC_BITS[:16]) + bytes(_DC_VALS)
    dht += bytes([0x10]) + bytes(_AC_BITS[:16]) + bytes(_AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(ncomp):
        out += bytes([cid + 1, 0x00])  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"

    bw = _BitWriter()
    bx, by = (width + 7) // 8, (height + 7) // 8
    preds = [0] * ncomp
    for yb in range(by):
        for xb in range(bx):
            for ci, plane in enumerate(planes):
                block = [[0.0] * 8 for _ in range(8)]
                for y in range(8):
                    sy = min(yb * 8 + y, height - 1)
                    for x in range(8):
                        sx = min(xb * 8 + x, width - 1)
                        block[y][x] = plane[sy * width + sx] - 128.0
                coef = _fdct2d(block)
                q = [
                    int(round(coef[r][c] / quant))
                    for (r, c) in ZIGZAG
                ]
                preds[ci] = _encode_block(bw, q, preds[ci])
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers
    (leaves them for the caller), byte-aligns on restart."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:  # stuffed
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: caller handles
            else:
                return False  # real marker (EOI/next segment)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, length: int) -> int | None:
        v = 0
        for _ in range(length):
            bit = self.read_bit()
            if bit is None:
                return None
            v = (v << 1) | bit
        return v

    def align_and_expect_restart(self) -> bool:
        """Skip to the RSTn marker at a restart interval boundary."""
        self.acc = self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return True
            self.pos += 1
        return False


class _Huff:
    """Canonical Huffman table from a DHT segment (BITS + values)."""

    def __init__(self, bits: list[int], vals: bytes) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int | None:
        code = 0
        for length in range(1, 17):
            bit = br.read_bit()
            if bit is None:
                return None
            code = (code << 1) | bit
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        return None


def _extend(v: int, size: int) -> int:
    """JPEG magnitude decode: v in [0, 2^size) -> signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """REAL baseline JPEG pixel decode, stdlib-only.  Returns
    ``(width, height, channels, pixels)`` — row-major gray or RGB — or
    None for non-JPEG, progressive/arithmetic, or corrupt streams
    (errors-as-data; the tiered dispatch falls back)."""
    if payload[:2] != b"\xff\xd8":
        return None
    try:
        return _decode(payload)
    except Exception:
        return None  # corrupt stream: never raise out of the decode stage


def _decode(d: bytes) -> tuple[int, int, int, bytes] | None:
    pos, n = 2, len(d)
    qtables: dict[int, list[int]] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None  # (width, height, comps)
    restart_interval = 0
    while pos + 4 <= n:
        if d[pos] != 0xFF:
            return None
        marker = d[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before scan
            return None
        seg_len = struct.unpack(">H", d[pos + 2:pos + 4])[0]
        body = d[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT: one or more tables
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                if prec == 0:
                    qtables[tid] = list(body[i:i + 64])
                    i += 64
                else:
                    qtables[tid] = [
                        struct.unpack(">H", body[i + 2 * j:i + 2 * j + 2])[0]
                        for j in range(64)
                    ]
                    i += 128
        elif marker == 0xC4:  # DHT: one or more tables
            i = 0
            while i + 17 <= len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                cnt = sum(bits)
                vals = body[i + 17:i + 17 + cnt]
                (huff_dc if cls == 0 else huff_ac)[tid] = _Huff(bits, vals)
                i += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
            precision = body[0]
            if precision != 8:
                return None
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = (w, h, comps)
        elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # progressive / arithmetic: out of scope
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                return None
            ns = body[0]
            scan = []
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            return _decode_scan(
                d, pos + 2 + seg_len, frame, scan, qtables,
                huff_dc, huff_ac, restart_interval,
            )
        pos += 2 + seg_len
    return None


def _decode_scan(d, pos, frame, scan, qtables, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame
    if w == 0 or h == 0 or not comps or len(scan) != len(comps):
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        return None
    if any(c["h"] < 1 or c["v"] < 1 or hmax % c["h"] or vmax % c["v"] for c in comps):
        return None  # non-integer upsample ratios: out of scope
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component plane at its own resolution
    planes = []
    for c in comps:
        cw, ch = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append([0] * (cw * ch))
    scan_by_comp = {cid: (dc, ac) for cid, dc, ac in scan}

    br = _BitReader(d, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not br.align_and_expect_restart():
                    return None
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                tabs = scan_by_comp.get(c["id"])
                if tabs is None:
                    return None
                dch = huff_dc.get(tabs[0])
                ach = huff_ac.get(tabs[1])
                qt = qtables.get(c["q"])
                if dch is None or ach is None or qt is None:
                    return None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(br, dch, ach)
                        if blk is None:
                            return None
                        diff, coefz = blk
                        preds[ci] += diff
                        coefz[0] = preds[ci]
                        coef = [[0.0] * 8 for _ in range(8)]
                        for i, (r, cc) in enumerate(ZIGZAG):
                            coef[r][cc] = coefz[i] * qt[i]
                        px = _idct2d(coef)
                        cw = mcux * 8 * c["h"]
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        plane = planes[ci]
                        for y in range(8):
                            row = (oy + y) * cw + ox
                            for x in range(8):
                                v = int(round(px[y][x])) + 128
                                plane[row + x] = 0 if v < 0 else (255 if v > 255 else v)
            mcu_count += 1

    # upsample to full resolution (nearest) and color-convert
    ncomp = len(comps)
    full = []
    for ci, c in enumerate(comps):
        cw = mcux * 8 * c["h"]
        sx, sy = hmax // c["h"], vmax // c["v"]
        plane = planes[ci]
        if sx == 1 and sy == 1:
            up = [plane[y * cw: y * cw + w] for y in range(h)]
            full.append([v for row in up for v in row])
        else:
            up = [
                plane[(y // sy) * cw + (x // sx)]
                for y in range(h)
                for x in range(w)
            ]
            full.append(up)
    if ncomp == 1:
        return w, h, 1, bytes(full[0])
    if ncomp == 3:
        yv, cb, cr = full
        out = bytearray(3 * w * h)
        for i in range(w * h):
            y0, b0, r0 = yv[i], cb[i] - 128, cr[i] - 128
            r = int(round(y0 + 1.402 * r0))
            g = int(round(y0 - 0.344136 * b0 - 0.714136 * r0))
            b = int(round(y0 + 1.772 * b0))
            out[3 * i] = 0 if r < 0 else (255 if r > 255 else r)
            out[3 * i + 1] = 0 if g < 0 else (255 if g > 255 else g)
            out[3 * i + 2] = 0 if b < 0 else (255 if b > 255 else b)
        return w, h, 3, bytes(out)
    return None  # CMYK etc.: out of scope


def _decode_block(br: _BitReader, dch: _Huff, ach: _Huff):
    """Decode one block's entropy data: returns (dc_diff, zigzag
    coefficient list with coefz[0] left 0 for the caller's predictor)."""
    size = dch.decode(br)
    if size is None or size > 15:
        return None
    if size:
        bits = br.receive(size)
        if bits is None:
            return None
        diff = _extend(bits, size)
    else:
        diff = 0
    coefz = [0] * 64
    k = 1
    while k < 64:
        sym = ach.decode(br)
        if sym is None:
            return None
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63 or size == 0:
            return None
        bits = br.receive(size)
        if bits is None:
            return None
        coefz[k] = _extend(bits, size)
        k += 1
    return diff, coefz
