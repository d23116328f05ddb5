"""Pure-stdlib baseline JPEG codec (ITU-T T.81): the dominant crawl
image format, decoded for the multimodal path without PIL/libjpeg.

Scope — baseline sequential DCT, 8-bit, Huffman entropy coding:

- grayscale (1 component) and YCbCr (3 components), 4:4:4 and 4:2:0
- general DHT parsing (BITS/HUFFVAL canonical construction, any
  conforming table — Annex K or otherwise), multi-slot DC/AC tables
- general DQT (8-bit tables), zigzag ordering
- the full entropy layer: DC differential coding with RECEIVE/EXTEND,
  AC run-length symbols (EOB, ZRL, (run,size)), byte stuffing
  (FF 00), marker framing (SOI/APPn/COM skip/DQT/SOF0/DHT/SOS/EOI)
- dequantize → de-zigzag → separable float IDCT → round half away
  from zero → level shift → clamp, per T.81 A.3.3
- progressive (SOF2), arithmetic coding, DNL, restart intervals and
  non-multiple-of-MCU dimensions raise ``ValueError`` — out of the
  declared subset, a decode task must fail loudly, never emit
  garbage pixels (the operators/png.py contract).

``decode_jpeg`` runs at the Arrow edge inside
``operators.multimodal.decode_image`` (magic-byte dispatch). The
per-block loops are pure Python — fine at gate/thumbnail sizes,
honest about needing a native codec for production resolution; the
Spark-side contract (schema, batching, partitioning) is identical
either way.

``encode_jpeg`` is the deterministic synthesizer used by tests and
the ``jpeg_decode_stats`` gate. It writes its OWN canonical Huffman
tables into DHT (all 12 DC categories at 4 bits; all 162 AC symbols
at 8 bits — valid prefix codes the decoder must build from the file,
exactly as it would Annex K's) and defaults to all-ones quantization
tables, under which an image whose 8×8 blocks are each FLAT decodes
bit-exactly (a flat block has only a DC coefficient, 8·(v−128),
integral — quantization and the IDCT round-trip are lossless on it).
That exactness is what lets the gate's oracle pin decoded channel
sums closed-form without ever seeing a codec byte. Encode and decode
are implemented independently (encoder writes spec structures, the
decoder parses them from the byte stream) and the tests pin each
direction with hand-computed micro-goldens plus an independent
numpy IDCT reference, so a compensating bug cannot hide in the
round-trip.

Reference analog: none in the reference tree — this is the
north-star multimodal scope (VERDICT r7 ask #2), the JPEG sibling of
``operators/png.py``.
"""

from __future__ import annotations

import math
import struct

# zigzag scan: index i of the scan order -> (row, col) in the 8x8 block
_ZIGZAG: list[tuple[int, int]] = []


def _build_zigzag() -> None:
    order = []
    for s in range(15):
        # anti-diagonal s runs toward (0, s) on even s per T.81 Fig. 5:
        # (0,0) (0,1) (1,0) (2,0) (1,1) (0,2) … — odd diagonals reverse
        diag = [(s - j, j) for j in range(s + 1)]
        if s % 2 == 1:
            diag.reverse()
        order.extend((r, c) for r, c in diag if r < 8 and c < 8)
    _ZIGZAG.extend(order)


_build_zigzag()

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7

# encoder Huffman tables (canonical, declared in DHT):
# DC: all 12 size categories at code length 4
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
# AC: EOB + 160 (run,size) + ZRL, all at code length 8
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_ENC_AC_VALS = (
    [0x00]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """BITS/HUFFVAL → {symbol: (code, length)} per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated after FF in scan")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker FF{marker:02X} inside scan"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _size_cat(v: int) -> int:
    """DC/AC size category: bits needed for |v|."""
    return 0 if v == 0 else abs(v).bit_length()


def _fdct_quant(block: list[list[int]], quant: list[int]) -> list[int]:
    """(level-shifted) forward DCT → rounded → quantized, in zigzag
    order. ``block`` is 8×8 spatial samples 0..255.

    Flat blocks take the closed form DC = 8·(v−128), AC = 0 — exactly
    what the general float path rounds to on a constant input (the
    AC cosine sums are mathematically zero, |float error| ≪ 0.5; the
    DC sum is exact integer arithmetic in doubles), so the fast path
    is bit-identical, just O(64) instead of O(64²). Real encoders
    special-case this the same way; the gate's flat-MCU synthesis
    rides it, the random-block tests pin the general path."""
    first = block[0][0]
    if all(v == first for row in block for v in row):
        dc = 8 * (first - 128)
        q = quant[0]
        out = [0] * 64
        out[0] = int(math.floor(abs(dc) / q + 0.5)) * (1 if dc >= 0 else -1)
        return out
    shifted = [[block[y][x] - 128 for x in range(8)] for y in range(8)]
    out = [0] * 64
    for i, (v, u) in enumerate(_ZIGZAG):
        s = 0.0
        for y in range(8):
            for x in range(8):
                s += shifted[y][x] * _COS[x][u] * _COS[y][v]
        val = s * _C[u] * _C[v] / 4.0
        q = quant[i]
        # round half away from zero (both stages)
        c = int(math.floor(abs(val) + 0.5)) * (1 if val >= 0 else -1)
        out[i] = int(
            math.floor(abs(c) / q + 0.5)
        ) * (1 if c >= 0 else -1)
    return out


def _idct_block(coef: list[int]) -> list[list[int]]:
    """Dequantized zigzag coefficients → 8×8 samples (rounded,
    level-shifted, clamped).

    DC-only blocks take the closed form pixel = clamp(round(DC/8 +
    128)) — the general sum has exactly one term, C₀²·DC·1·1/4 =
    DC/8, and /8.0 is exact in doubles, so the fast path is
    bit-identical to the general loop (libjpeg's idct special-case)."""
    if not any(coef[1:]):
        val = coef[0] / 8.0 + 128.0
        p = int(math.floor(val + 0.5))
        p = 0 if p < 0 else (255 if p > 255 else p)
        return [[p] * 8 for _ in range(8)]
    s = [[0] * 8 for _ in range(8)]
    for i, (v, u) in enumerate(_ZIGZAG):
        if coef[i]:
            s[v][u] = coef[i]
    out = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                for u in range(8):
                    c = s[v][u]
                    if c:
                        acc += (
                            _C[u] * _C[v] * c * _COS[x][u] * _COS[y][v]
                        )
            val = acc / 4.0 + 128.0
            p = int(math.floor(val + 0.5))
            out[y][x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def _encode_block(
    coef: list[int],
    pred: int,
    w: _BitWriter,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Entropy-encode one quantized block (zigzag order); returns the
    new DC predictor."""
    diff = coef[0] - pred
    t = _size_cat(diff)
    code, length = dc_codes[t]
    w.write(code, length)
    if t:
        mag = diff if diff >= 0 else diff + (1 << t) - 1
        w.write(mag, t)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coef[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if coef[i] == 0:
            run += 1
            continue
        while run >= 16:
            zc, zl = ac_codes[0xF0]
            w.write(zc, zl)
            run -= 16
        s = _size_cat(coef[i])
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        v = coef[i]
        mag = v if v >= 0 else v + (1 << s) - 1
        w.write(mag, s)
        run = 0
    if last_nz != 63:
        ec, el = ac_codes[0x00]
        w.write(ec, el)
    return coef[0]


def encode_jpeg(
    planes: list[list[list[int]]],
    subsampling: str = "444",
    quant_luma: list[int] | None = None,
    quant_chroma: list[int] | None = None,
) -> bytes:
    """Component planes → baseline JPEG bytes.

    ``planes`` is ``[Y]`` (grayscale) or ``[Y, Cb, Cr]`` given at
    their NATURAL resolutions: for 4:2:0 the chroma planes are
    half-size in both dimensions; for 4:4:4 all three match. Y
    dimensions must be a multiple of 8 (4:4:4 / grayscale) or 16
    (4:2:0). Quant tables are in zigzag order, default all ones."""
    ql = quant_luma or [1] * 64
    qc = quant_chroma or [1] * 64
    n_comp = len(planes)
    if n_comp not in (1, 3):
        raise ValueError("1 (gray) or 3 (YCbCr) planes")
    h_y = len(planes[0])
    w_y = len(planes[0][0])
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    two = subsampling == "420" and n_comp == 3
    mcu = 16 if two else 8
    if w_y % mcu or h_y % mcu:
        raise ValueError(f"dimensions must be multiples of {mcu}")
    if n_comp == 3:
        cw, ch_ = (w_y // 2, h_y // 2) if two else (w_y, h_y)
        for p in planes[1:]:
            if len(p) != ch_ or len(p[0]) != cw:
                raise ValueError("chroma plane dims mismatch subsampling")

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    # DQT: table 0 (luma) + table 1 (chroma, only when 3 components)
    seg(0xDB, bytes([0x00]) + bytes(ql))
    if n_comp == 3:
        seg(0xDB, bytes([0x01]) + bytes(qc))
    # SOF0
    comps = bytearray()
    if n_comp == 1:
        comps += bytes([1, 0x11, 0])
    else:
        yhv = 0x22 if two else 0x11
        comps += bytes([1, yhv, 0])
        comps += bytes([2, 0x11, 1])
        comps += bytes([3, 0x11, 1])
    seg(0xC0, struct.pack(">BHHB", 8, h_y, w_y, n_comp) + bytes(comps))
    # DHT: DC 0, AC 0 (+ DC 1, AC 1 for color)
    dht = bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    if n_comp == 3:
        dht += bytes([0x01]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        dht += bytes([0x11]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    seg(0xC4, dht)
    # SOS
    sos = bytearray([n_comp])
    if n_comp == 1:
        sos += bytes([1, 0x00])
    else:
        sos += bytes([1, 0x00, 2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    w = _BitWriter()
    preds = [0] * n_comp
    quants = [ql] + [qc] * (n_comp - 1)

    def emit(ci: int, bx: int, by: int) -> None:
        p = planes[ci]
        blk = [p[by * 8 + y][bx * 8 : bx * 8 + 8] for y in range(8)]
        coef = _fdct_quant(blk, quants[ci])
        preds[ci] = _encode_block(coef, preds[ci], w, dc_codes, ac_codes)

    mcus_x = w_y // mcu
    mcus_y = h_y // mcu
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if n_comp == 1:
                emit(0, mx, my)
            elif two:
                for dy in range(2):
                    for dx in range(2):
                        emit(0, mx * 2 + dx, my * 2 + dy)
                emit(1, mx, my)
                emit(2, mx, my)
            else:
                emit(0, mx, my)
                emit(1, mx, my)
                emit(2, mx, my)
    w.flush()
    out.extend(w.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


class _HuffTable:
    """Canonical Huffman decoder table built from BITS/HUFFVAL."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        # (min_code, max_code, first_index) per length, T.81 F.2.2.3
        self.vals = vals
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.val_ptr[length] = k
                self.min_code[length] = code
                self.max_code[length] = code + n - 1
                code += n
                k += n
            else:
                self.max_code[length] = -1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.read_bit()
            if self.max_code[length] >= code >= self.min_code[length]:
                return self.vals[
                    self.val_ptr[length] + code - self.min_code[length]
                ]
        raise ValueError("invalid Huffman code in scan")


def decode_jpeg(
    payload: bytes,
) -> tuple[int, int, int, list[list[list[int]]]]:
    """JPEG bytes → (width, height, n_components, planes), every plane
    upsampled to full width×height (2×2 replication for 4:2:0 chroma).
    Raises ``ValueError`` on corruption or out-of-subset features."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    scan = None  # ([(cid, td, ta)], entropy_pos)
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = list(body[i + 1 : i + 65])
                if len(qtabs[tq]) != 64:
                    raise ValueError("truncated DQT")
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                htabs[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xC0:
            prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid = body[6 + ci * 3]
                hv = body[7 + ci * 3]
                comps.append((cid, hv >> 4, hv & 0xF, body[8 + ci * 3]))
            frame = (h, w_, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0)"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            ns = body[0]
            scomps = []
            for ci in range(ns):
                cid = body[1 + ci * 2]
                tt = body[2 + ci * 2]
                scomps.append((cid, tt >> 4, tt & 0xF))
            scan = (scomps, pos + 2 + ln)
            break  # entropy-coded data follows
        # APPn / COM / others: skip
        pos += 2 + ln
    if frame is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    h, w_, comps = frame
    scomps, epos = scan
    if [c[0] for c in comps] != [c[0] for c in scomps]:
        raise ValueError("scan/frame component mismatch")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    allowed = {(1, 1)}
    if len(comps) == 3:
        allowed = {(1, 1), (2, 2)}
    if (hmax, vmax) not in allowed or any(
        (c[1], c[2]) != (1, 1) for c in comps[1:]
    ):
        raise ValueError("only 4:4:4 / 4:2:0 sampling in subset")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    if w_ % mcu_w or h % mcu_h:
        raise ValueError("dimensions must be multiples of the MCU")
    mcus_x, mcus_y = w_ // mcu_w, h // mcu_h

    # per-component raw (subsampled) planes
    raw: list[list[list[int]]] = []
    for cid, hi, vi, tq in comps:
        raw.append(
            [[0] * (mcus_x * 8 * hi) for _ in range(mcus_y * 8 * vi)]
        )
    r = _BitReader(payload, epos)
    preds = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                td, ta = scomps[ci][1], scomps[ci][2]
                dc_t = htabs.get((0, td))
                ac_t = htabs.get((1, ta))
                q = qtabs.get(tq)
                if dc_t is None or ac_t is None or q is None:
                    raise ValueError("scan references undefined table")
                for dy in range(vi):
                    for dx in range(hi):
                        coef = [0] * 64
                        t = dc_t.decode(r)
                        if t > 11:
                            raise ValueError("bad DC size category")
                        diff = _extend(r.receive(t), t)
                        preds[ci] += diff
                        coef[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(r)
                            if rs == 0x00:  # EOB
                                break
                            run, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overrun")
                            coef[k] = _extend(r.receive(s), s) * q[k]
                            k += 1
                        blk = _idct_block(coef)
                        by0 = (my * vi + dy) * 8
                        bx0 = (mx * hi + dx) * 8
                        plane = raw[ci]
                        for y in range(8):
                            row = plane[by0 + y]
                            row[bx0 : bx0 + 8] = blk[y]
    # upsample every plane to full resolution (nearest)
    planes: list[list[list[int]]] = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        sx, sy = hmax // hi, vmax // vi
        if sx == 1 and sy == 1:
            planes.append(raw[ci])
        else:
            up = []
            for y in range(h):
                src = raw[ci][y // sy]
                up.append([src[x // sx] for x in range(w_)])
            planes.append(up)
    return w_, h, len(comps), planes


def ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """JFIF/BT.601 full-range conversion, rounded half away from zero
    and clamped — the deterministic integer surface decode_image
    exposes."""

    def _r(v: float) -> int:
        p = int(math.floor(v + 0.5))
        return 0 if p < 0 else (255 if p > 255 else p)

    return (
        _r(y + 1.402 * (cr - 128)),
        _r(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        _r(y + 1.772 * (cb - 128)),
    )
