"""Pure-stdlib JPEG codec (ITU-T T.81): the dominant crawl image
format, decoded for the multimodal path without PIL/libjpeg.

Scope — 8-bit Huffman DCT, baseline sequential (SOF0) AND
progressive (SOF2):

- grayscale (1 component) and YCbCr (3 components), 4:4:4 and 4:2:0
- general DHT parsing (BITS/HUFFVAL canonical construction, any
  conforming table — Annex K or otherwise), multi-slot DC/AC tables,
  tables redefinable between scans
- the full baseline entropy layer: DC differential coding with
  RECEIVE/EXTEND, AC run-length symbols (EOB, ZRL, (run,size)), byte
  stuffing (FF 00), marker framing (SOI/APPn/COM skip/DQT/SOF/DHT/
  SOS/EOI), 0xFF fill bytes between segments skipped per B.1.1.2
- the full progressive entropy layer (T.81 G.1.2): spectral
  selection (Ss..Se bands, AC scans single-component), successive
  approximation (DC point transform = arithmetic shift + one
  refinement bit per block per pass; AC first passes with EOBn
  end-of-band run coding, AC refinement passes with newly-nonzero
  ±2^Al insertions and correction bits on already-nonzero
  coefficients — the jdphuff algorithm, implemented independently on
  both sides and pinned by hand-built bitstream goldens)
- dequantize → de-zigzag → separable float IDCT → round half away
  from zero → level shift → clamp, per T.81 A.3.3; decode accumulates
  quantized coefficients across scans and transforms once at EOI
- restart intervals (DRI/RSTn — ubiquitous in real crawl JPEGs):
  the decoder consumes RSTm markers at the declared MCU boundaries
  (byte-align, verify the cycling marker index, reset DC predictors
  and — in progressive AC scans, where the restart unit is one
  block — the EOB run); the encoder emits them for synthesis/tests
- arithmetic coding, lossless/hierarchical SOFs, DNL and
  non-multiple-of-MCU dimensions raise ``ValueError``
  — out of the declared subset, a decode task must fail loudly,
  never emit garbage pixels (the operators/png.py contract).
  Standalone markers (RSTn/TEM) in the HEADER raise an explicit
  diagnostic instead of being misparsed as length-bearing segments;
  inside a scan they are consumed only at declared boundaries and a
  mid-block marker still raises.

``decode_jpeg`` runs at the Arrow edge inside
``operators.multimodal.decode_image`` (magic-byte dispatch). The
per-block loops are pure Python — fine at gate/thumbnail sizes,
honest about needing a native codec for production resolution; the
Spark-side contract (schema, batching, partitioning) is identical
either way.

``encode_jpeg`` is the deterministic synthesizer used by tests and
the ``jpeg_decode_stats`` gate. It writes its OWN canonical Huffman
tables into DHT (all 12 DC categories at 4 bits; all 162 baseline AC
symbols — plus the 14 EOBn symbols when progressive — at 8 bits:
valid prefix codes the decoder must build from the file, exactly as
it would Annex K's) and defaults to all-ones quantization tables,
under which an image whose 8×8 blocks are each FLAT decodes
bit-exactly (a flat block has only a DC coefficient, 8·(v−128),
integral — quantization and the IDCT round-trip are lossless on it,
and progressive transmission of a coefficient is lossless by
construction). That exactness is what lets the gate's oracle pin
decoded channel sums closed-form without ever seeing a codec byte.
``progressive=True`` emits an SOF2 scan script exercising both
progressive dimensions: an Al=1 DC first scan + DC refinement, then
per component two spectral bands (1..5, 6..63) sent at Al=2 and
refined twice (Ah=2→Al=1, Ah=1→Al=0). Encode and decode are
implemented independently (encoder writes spec structures, the
decoder parses them from the byte stream) and the tests pin each
direction with hand-computed micro-goldens plus an independent
numpy IDCT reference, so a compensating bug cannot hide in the
round-trip; progressive and baseline encodings of the same planes
must decode pixel-identically (same quantized coefficients).

Reference analog: none in the reference tree — this is the
north-star multimodal scope (VERDICT r7 ask #2 baseline, r8 ask #1
progressive), the JPEG sibling of ``operators/png.py``.
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
# AC baseline: EOB + 160 (run,size) + ZRL, all at code length 8
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_ENC_AC_VALS = (
    [0x00]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
)
# AC progressive: the baseline 162 plus EOB1..EOB14 ((r<<4)|0), still
# all at 8 bits — 176 ≤ 256 codes, a valid canonical table
_ENC_AC_BITS_PROG = [0] * 7 + [176] + [0] * 8
_ENC_AC_VALS_PROG = _ENC_AC_VALS + [r << 4 for r in range(1, 15)]


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

    def restart(self, m: int) -> None:
        """Consume an RSTm marker at a restart boundary: discard any
        partial byte (entropy data is 1-padded to the boundary), then
        expect exactly FF D0+m. Mid-block markers still raise via
        read_bit — only the scan loops, which know the MCU count,
        call this."""
        self._n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated at restart boundary")
        if (self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + m):
            raise ValueError(
                f"expected RST{m} at offset {self.pos}, got "
                f"{self.data[self.pos]:02X}{self.data[self.pos + 1]:02X}"
            )
        self.pos += 2


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


# ---------------------------------------------------------------------------
# progressive scan emission (T.81 G.1.2) — encoder side
# ---------------------------------------------------------------------------


class _AcScanState:
    """Cross-block state of one progressive AC scan: the pending
    end-of-band run and (refinement passes only) the correction bits
    that must trail the next emitted symbol."""

    def __init__(self, w: _BitWriter, ac_codes: dict) -> None:
        self.w = w
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits riding the EOB run

    def flush_eobrun(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.ac_codes[r << 4]
            self.w.write(code, ln)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []


def _encode_dc_first(coef: list[int], pred: int, al: int,
                     w: _BitWriter, dc_codes: dict) -> int:
    """DC first pass: diff of the point-transformed (arithmetic shift
    right by Al) DC, category + magnitude bits. Returns new predictor
    (in the shifted domain)."""
    dc = coef[0] >> al
    diff = dc - pred
    t = _size_cat(diff)
    code, length = dc_codes[t]
    w.write(code, length)
    if t:
        mag = diff if diff >= 0 else diff + (1 << t) - 1
        w.write(mag, t)
    return dc


def _encode_ac_first(coef: list[int], ss: int, se: int, al: int,
                     st: _AcScanState) -> None:
    """AC first pass over one block: run-length over the point-
    transformed band with EOBn end-of-band run accumulation."""
    w, ac = st.w, st.ac_codes
    run = 0
    emitted = False
    for k in range(ss, se + 1):
        v = coef[k]
        # AC point transform truncates toward zero (G.1.2.2)
        t = (v >> al) if v >= 0 else -((-v) >> al)
        if t == 0:
            run += 1
            continue
        st.flush_eobrun()
        while run > 15:
            zc, zl = ac[0xF0]
            w.write(zc, zl)
            run -= 16
        s = _size_cat(t)
        code, length = ac[(run << 4) | s]
        w.write(code, length)
        mag = t if t >= 0 else t + (1 << s) - 1
        w.write(mag, s)
        run = 0
        emitted = True
    if run > 0 or not emitted:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _encode_ac_refine(coef: list[int], ss: int, se: int, al: int,
                      st: _AcScanState) -> None:
    """AC refinement pass over one block (the jdphuff/jcphuff
    algorithm): newly-nonzero coefficients (|v|>>Al == 1) emit
    (run,1) symbols + a sign bit; already-nonzero coefficients
    contribute one correction bit each, buffered until the next
    symbol (or the EOB run) so the decoder reads them in the same
    order it walks the band."""
    w, ac = st.w, st.ac_codes
    absv = [0] * (se + 1)
    eob = ss - 1  # index of the LAST newly-nonzero coefficient
    for k in range(ss, se + 1):
        a = abs(coef[k]) >> al
        absv[k] = a
        if a == 1:
            eob = k
    run = 0
    br: list[int] = []  # correction bits awaiting the next symbol
    for k in range(ss, se + 1):
        a = absv[k]
        if a == 0:
            run += 1
            continue
        # emit required ZRLs BEFORE classifying this coefficient
        # (libjpeg order: a ZRL's 16 consumed zeros may precede a
        # history coefficient, whose correction bit must then ride
        # the NEXT symbol — not this ZRL); zeros fold into the EOB
        # run instead when no newly-nonzero coefficient follows
        while run > 15 and k <= eob:
            st.flush_eobrun()
            zc, zl = ac[0xF0]
            w.write(zc, zl)
            run -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if a > 1:
            # history: already nonzero before this pass — one
            # correction bit (bit Al of the magnitude = a & 1), does
            # NOT count in the zero-history run
            br.append(a & 1)
            continue
        # newly nonzero at this approximation level
        st.flush_eobrun()
        code, length = ac[(run << 4) | 1]
        w.write(code, length)
        w.write(1 if coef[k] > 0 else 0, 1)
        for b in br:
            w.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def encode_jpeg(
    planes: list[list[list[int]]],
    subsampling: str = "444",
    quant_luma: list[int] | None = None,
    quant_chroma: list[int] | None = None,
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Component planes → JPEG bytes (baseline SOF0, or progressive
    SOF2 with ``progressive=True``).

    ``planes`` is ``[Y]`` (grayscale) or ``[Y, Cb, Cr]`` given at
    their NATURAL resolutions: for 4:2:0 the chroma planes are
    half-size in both dimensions; for 4:4:4 all three match. Y
    dimensions must be a multiple of 8 (4:4:4 / grayscale) or 16
    (4:2:0). Quant tables are in zigzag order, default all ones.

    The progressive scan script is fixed (see module docstring): it
    transmits the SAME quantized coefficients as the baseline path —
    decoding either encoding of the same planes is pixel-identical —
    while exercising spectral selection, DC/AC successive
    approximation, EOBn run coding and correction bits.

    ``restart_interval=N`` emits a DRI segment and an RSTm marker
    every N MCUs of every scan (m cycling 0..7 per scan; in
    non-interleaved progressive AC scans the restart unit is one
    block, per T.81): predictors — DC deltas, and the EOB run in AC
    scans — reset at each boundary, the property that lets a decoder
    resynchronize after corruption and a parallel encoder emit
    segments independently."""
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
    if progressive:
        ac_codes = _canonical_codes(_ENC_AC_BITS_PROG, _ENC_AC_VALS_PROG)
    else:
        ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    quants = [ql] + [qc] * (n_comp - 1)
    samp = [(2, 2)] if two else [(1, 1)]
    if n_comp == 3:
        samp = samp + [(1, 1), (1, 1)]
    mcus_x = w_y // mcu
    mcus_y = h_y // mcu

    # quantize every block up front (zigzag order), per component
    coefs: list[list[list[list[int]]]] = []
    for ci in range(n_comp):
        hi, vi = samp[ci]
        bx_n, by_n = mcus_x * hi, mcus_y * vi
        p = planes[ci]
        comp = []
        for by in range(by_n):
            row = []
            for bx in range(bx_n):
                blk = [p[by * 8 + y][bx * 8 : bx * 8 + 8] for y in range(8)]
                row.append(_fdct_quant(blk, quants[ci]))
            comp.append(row)
        coefs.append(comp)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    # DQT: table 0 (luma) + table 1 (chroma, only when 3 components)
    seg(0xDB, bytes([0x00]) + bytes(ql))
    if n_comp == 3:
        seg(0xDB, bytes([0x01]) + bytes(qc))
    # SOF0 (baseline) / SOF2 (progressive)
    comps = bytearray()
    if n_comp == 1:
        comps += bytes([1, 0x11, 0])
    else:
        yhv = 0x22 if two else 0x11
        comps += bytes([1, yhv, 0])
        comps += bytes([2, 0x11, 1])
        comps += bytes([3, 0x11, 1])
    seg(0xC2 if progressive else 0xC0,
        struct.pack(">BHHB", 8, h_y, w_y, n_comp) + bytes(comps))
    # DHT: DC 0, AC 0 (+ DC 1, AC 1 for color)
    ac_bits = _ENC_AC_BITS_PROG if progressive else _ENC_AC_BITS
    ac_vals = _ENC_AC_VALS_PROG if progressive else _ENC_AC_VALS
    dht = bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    if n_comp == 3:
        dht += bytes([0x01]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        dht += bytes([0x11]) + bytes(ac_bits) + bytes(ac_vals)
    seg(0xC4, dht)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    def emit_restart(w: _BitWriter, unit_idx: int) -> bool:
        """At a restart boundary (unit_idx > 0, multiple of the
        interval): byte-align with 1-fill and append RSTm. Returns
        True when a restart was emitted (callers reset predictors)."""
        if not restart_interval or unit_idx == 0 \
                or unit_idx % restart_interval:
            return False
        w.flush()
        m = (unit_idx // restart_interval - 1) % 8
        w.out.extend(bytes([0xFF, 0xD0 + m]))
        return True

    def sos_header(comp_ids: list[int], ss: int, se: int,
                   ah: int, al: int) -> None:
        body = bytearray([len(comp_ids)])
        for cid in comp_ids:
            t = 0 if cid == 1 else 1
            body += bytes([cid, (t << 4) | t])
        body += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(body))

    def mcu_blocks(ci: int):
        """Block (by, bx) sequence of component ci in interleaved
        MCU order (generator per MCU position)."""
        hi, vi = samp[ci]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for dy in range(vi):
                    for dx in range(hi):
                        yield my * vi + dy, mx * hi + dx

    if not progressive:
        sos_header(list(range(1, n_comp + 1)), 0, 63, 0, 0)
        w = _BitWriter()
        preds = [0] * n_comp
        its = [mcu_blocks(ci) for ci in range(n_comp)]
        mcu_idx = 0
        for _my in range(mcus_y):
            for _mx in range(mcus_x):
                if emit_restart(w, mcu_idx):
                    preds = [0] * n_comp
                mcu_idx += 1
                for ci in range(n_comp):
                    hi, vi = samp[ci]
                    for _ in range(hi * vi):
                        by, bx = next(its[ci])
                        preds[ci] = _encode_block(
                            coefs[ci][by][bx], preds[ci], w,
                            dc_codes, ac_codes,
                        )
        w.flush()
        out.extend(w.out)
        out.extend(b"\xff\xd9")
        return bytes(out)

    # --- progressive scan script ---
    all_ids = list(range(1, n_comp + 1))

    def dc_scan(ah: int, al: int) -> None:
        sos_header(all_ids, 0, 0, ah, al)
        w = _BitWriter()
        preds = [0] * n_comp
        its = [mcu_blocks(ci) for ci in range(n_comp)]
        mcu_idx = 0
        for _my in range(mcus_y):
            for _mx in range(mcus_x):
                if emit_restart(w, mcu_idx):
                    preds = [0] * n_comp
                mcu_idx += 1
                for ci in range(n_comp):
                    hi, vi = samp[ci]
                    for _ in range(hi * vi):
                        by, bx = next(its[ci])
                        c = coefs[ci][by][bx]
                        if ah == 0:
                            preds[ci] = _encode_dc_first(
                                c, preds[ci], al, w, dc_codes
                            )
                        else:
                            w.write((c[0] >> al) & 1, 1)
        w.flush()
        out.extend(w.out)

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> None:
        sos_header([ci + 1], ss, se, ah, al)
        w = _BitWriter()
        st = _AcScanState(w, ac_codes)
        comp = coefs[ci]
        blk_idx = 0
        for row in comp:  # raster order over the component's blocks
            for c in row:
                if restart_interval and blk_idx \
                        and blk_idx % restart_interval == 0:
                    st.flush_eobrun()  # an EOB run cannot span RSTm
                    emit_restart(w, blk_idx)
                blk_idx += 1
                if ah == 0:
                    _encode_ac_first(c, ss, se, al, st)
                else:
                    _encode_ac_refine(c, ss, se, al, st)
        st.flush_eobrun()
        w.flush()
        out.extend(w.out)

    dc_scan(0, 1)
    dc_scan(1, 0)
    bands = [(1, 5), (6, 63)]
    for ss, se in bands:
        for ci in range(n_comp):
            ac_scan(ci, ss, se, 0, 2)
    for ah, al in ((2, 1), (1, 0)):
        for ss, se in bands:
            for ci in range(n_comp):
                ac_scan(ci, ss, se, ah, al)
    out.extend(b"\xff\xd9")
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


def _decode_ac_refine_block(coef: list[int], ss: int, se: int, al: int,
                            r: _BitReader, ac_t: _HuffTable,
                            eobrun: int) -> int:
    """One block of an AC successive-approximation refinement scan
    (T.81 G.1.2.3 / jdphuff decode_mcu_AC_refine): already-nonzero
    coefficients read one correction bit each as the band is walked;
    (run,1) symbols insert newly-nonzero ±2^Al values after `run`
    zero-HISTORY positions; EOBn starts an end-of-band run during
    which remaining nonzero coefficients still take correction bits.
    Returns the outstanding eobrun."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac_t.decode(r)
            run, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if run < 15:
                    # NOTE: unlike the first-pass decode, the count
                    # INCLUDES the current block — the tail below must
                    # still read correction bits for its remaining
                    # nonzero coefficients before decrementing
                    eobrun = 1 << run
                    if run:
                        eobrun += r.receive(run)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement symbol")
                newval = p1 if r.read_bit() else m1
            # advance over `run` zero-history positions, refining
            # nonzero coefficients passed along the way
            while k <= se:
                if coef[k] != 0:
                    if r.read_bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if s:
                if k > se:
                    raise ValueError("AC refinement index overrun")
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                if r.read_bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker(payload: bytes, pos: int) -> int:
    """Position of the next marker (the 0xFF byte) at/after pos,
    skipping entropy padding and 0xFF fill bytes."""
    n = len(payload)
    while pos < n:
        if payload[pos] == 0xFF and pos + 1 < n:
            nxt = payload[pos + 1]
            if nxt == 0x00:
                pos += 2  # stuffed byte, not a marker
                continue
            if nxt == 0xFF:
                pos += 1  # fill byte
                continue
            return pos
        pos += 1
    raise ValueError("missing EOI (no marker after scan)")


def decode_jpeg(
    payload: bytes,
) -> tuple[int, int, int, list[list[list[int]]]]:
    """JPEG bytes → (width, height, n_components, planes), every plane
    upsampled to full width×height (2×2 replication for 4:2:0 chroma).
    Baseline (SOF0) and progressive (SOF2) Huffman streams; raises
    ``ValueError`` on corruption or out-of-subset features.

    Decoding accumulates QUANTIZED coefficients per block across
    scans (one scan for baseline; the full scan script for
    progressive — DC first/refine, AC spectral bands at successive
    approximation levels) and runs dequant+IDCT once at EOI, so both
    paths share one transform and baseline output is bit-identical
    to the pre-progressive implementation."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)], progressive)
    coefs: list[list[list[list[int]]]] = []  # [ci][by][bx][64], quantized
    dims: list[tuple[int, int]] = []  # blocks (bx_n, by_n) per component
    mcus_x = mcus_y = 0
    dri = 0  # restart interval in MCUs (0 = disabled)
    saw_eoi = False
    saw_sos = False

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # 0xFF fill bytes before a marker (B.1.1.2)
        if pos + 2 > len(payload):
            raise ValueError("truncated marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            raise ValueError(
                f"standalone marker FF{marker:02X} (TEM/RSTn) unsupported"
            )
        if pos + 4 > len(payload):
            raise ValueError("truncated segment header")
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
        elif marker in (0xC0, 0xC2):
            if frame is not None:
                raise ValueError("multiple SOF markers")
            prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid = body[6 + ci * 3]
                hv = body[7 + ci * 3]
                comps.append((cid, hv >> 4, hv & 0xF, body[8 + ci * 3]))
            frame = (h, w_, comps, marker == 0xC2)
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
            for cid, hi, vi, tq in comps:
                bx_n, by_n = mcus_x * hi, mcus_y * vi
                dims.append((bx_n, by_n))
                coefs.append(
                    [[[0] * 64 for _ in range(bx_n)] for _ in range(by_n)]
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline (SOF0) and"
                " progressive (SOF2) Huffman DCT"
            )
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDC:
            raise ValueError("DNL unsupported")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            h, w_, comps, progressive = frame
            ns = body[0]
            scomps = []
            for ci in range(ns):
                cid = body[1 + ci * 2]
                tt = body[2 + ci * 2]
                scomps.append((cid, tt >> 4, tt & 0xF))
            ss, se, ahl = body[1 + ns * 2 : 4 + ns * 2]
            ah, al = ahl >> 4, ahl & 0xF
            if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("bad baseline scan parameters")
            epos = pos + 2 + ln
            cids = [c[0] for c in comps]
            try:
                sidx = [cids.index(sc[0]) for sc in scomps]
            except ValueError:
                raise ValueError("scan references unknown component")
            r = _BitReader(payload, epos)

            if ss == 0:  # DC scan (baseline full scan also enters here)
                if se != 0 and progressive:
                    raise ValueError("progressive DC scan must have Se=0")
                preds = [0] * len(sidx)
                interleaved = len(sidx) > 1
                if interleaved:
                    # restart units = interleaved MCUs
                    mcus: list[list[tuple[int, int, int]]] = []
                    for my in range(mcus_y):
                        for mx in range(mcus_x):
                            unit = []
                            for j, ci in enumerate(sidx):
                                _, hi, vi, _ = comps[ci]
                                for dy in range(vi):
                                    for dx in range(hi):
                                        unit.append(
                                            (j, my * vi + dy, mx * hi + dx)
                                        )
                            mcus.append(unit)
                else:
                    # non-interleaved: the restart unit is one block
                    ci = sidx[0]
                    bx_n, by_n = dims[ci]
                    mcus = [
                        [(0, by, bx)]
                        for by in range(by_n)
                        for bx in range(bx_n)
                    ]
                for mi, unit in enumerate(mcus):
                    if dri and mi and mi % dri == 0:
                        # RSTm boundary: byte-align, consume marker,
                        # reset the DC predictors (T.81 F.2.1.3.1)
                        r.restart((mi // dri - 1) % 8)
                        preds = [0] * len(sidx)
                    for j, by, bx in unit:
                        ci = sidx[j]
                        coef = coefs[ci][by][bx]
                        if progressive and ah != 0:
                            if r.read_bit():
                                coef[0] |= 1 << al
                            continue
                        td = scomps[j][1]
                        dc_t = htabs.get((0, td))
                        if dc_t is None:
                            raise ValueError(
                                "scan references undefined table"
                            )
                        t = dc_t.decode(r)
                        if t > 11:
                            raise ValueError("bad DC size category")
                        diff = _extend(r.receive(t), t)
                        preds[j] += diff
                        coef[0] = preds[j] << al
                        if not progressive:
                            # baseline: AC follows in the same data unit
                            ta = scomps[j][2]
                            ac_t = htabs.get((1, ta))
                            if ac_t is None:
                                raise ValueError(
                                    "scan references undefined table"
                                )
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
                                coef[k] = _extend(r.receive(s), s)
                                k += 1
            else:  # progressive AC scan
                if not progressive:
                    raise ValueError("AC band scan in baseline stream")
                if len(sidx) != 1:
                    raise ValueError("progressive AC scan must be"
                                     " single-component")
                if not (1 <= ss <= se <= 63):
                    raise ValueError("bad spectral band")
                ci = sidx[0]
                ta = scomps[0][2]
                ac_t = htabs.get((1, ta))
                if ac_t is None:
                    raise ValueError("scan references undefined table")
                bx_n, by_n = dims[ci]
                eobrun = 0
                blk_idx = 0
                for by in range(by_n):
                    for bx in range(bx_n):
                        if dri and blk_idx and blk_idx % dri == 0:
                            # non-interleaved: restart unit = 1 block;
                            # the EOB run resets with the predictors
                            r.restart((blk_idx // dri - 1) % 8)
                            eobrun = 0
                        blk_idx += 1
                        coef = coefs[ci][by][bx]
                        if ah != 0:
                            eobrun = _decode_ac_refine_block(
                                coef, ss, se, al, r, ac_t, eobrun
                            )
                            continue
                        if eobrun > 0:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = ac_t.decode(r)
                            run, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                eobrun = (1 << run) - 1
                                if run:
                                    eobrun += r.receive(run)
                                break
                            k += run
                            if k > se:
                                raise ValueError("AC index overrun")
                            coef[k] = _extend(r.receive(s), s) << al
                            k += 1
            # scan decoded: resume the marker loop at the terminator
            saw_sos = True
            pos = _next_marker(payload, r.pos)
            continue
        # APPn / COM / others: skip
        pos += 2 + ln

    if frame is None:
        raise ValueError("missing SOF")
    # coefs exists from SOF on — the guard must key on a DECODED scan,
    # or a truncated file with no entropy data would fabricate an
    # all-gray image from the zero coefficients (review r9)
    if not saw_sos or not saw_eoi:
        raise ValueError("missing SOS or EOI")
    h, w_, comps, progressive = frame

    # dequantize + IDCT every block, assemble subsampled planes
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    raw: list[list[list[int]]] = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        q = qtabs.get(tq)
        if q is None:
            raise ValueError("frame references undefined quant table")
        bx_n, by_n = dims[ci]
        plane = [[0] * (bx_n * 8) for _ in range(by_n * 8)]
        for by in range(by_n):
            for bx in range(bx_n):
                c = coefs[ci][by][bx]
                blk = _idct_block([c[i] * q[i] for i in range(64)])
                for y in range(8):
                    plane[by * 8 + y][bx * 8 : bx * 8 + 8] = blk[y]
        raw.append(plane)

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
