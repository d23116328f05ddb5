"""Baseline JPEG codec (operators/jpeg.py): spec micro-goldens per
direction, independent-reference IDCT/AC checks, subset error paths,
and the decode_image magic-byte dispatch."""

from __future__ import annotations

import math

import pytest

from jobinsight_data_pipeline_v2_spark.operators.jpeg import (
    _BitReader,
    _BitWriter,
    _ZIGZAG,
    _canonical_codes,
    _extend,
    _fdct_quant,
    _HuffTable,
    _idct_block,
    _size_cat,
    decode_jpeg,
    encode_jpeg,
    ycbcr_to_rgb,
)


def test_zigzag_spec_golden():
    """T.81 Figure 5 corners: the scan starts (0,0),(0,1),(1,0),(2,0)…
    and ends …(7,6),(6,7),(7,7)."""
    assert _ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert _ZIGZAG[-4:] == [(5, 7), (6, 7), (7, 6), (7, 7)]
    assert len(set(_ZIGZAG)) == 64
    # the standard flat table (row*8+col), transcribed independently
    flat = [r * 8 + c for r, c in _ZIGZAG]
    assert flat == [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]


def test_extend_and_size_categories():
    """F.2.2.1 EXTEND against the spec table: category t covers
    ±[2^(t-1), 2^t-1], low values map negative."""
    assert _extend(0, 0) == 0
    assert _extend(1, 1) == 1 and _extend(0, 1) == -1
    assert _extend(0b10, 2) == 2 and _extend(0b00, 2) == -3
    assert _extend(0b011, 3) == -4 and _extend(0b111, 3) == 7
    for v in (-255, -128, -1, 0, 1, 127, 255, 1023):
        t = _size_cat(v)
        mag = v if v >= 0 else v + (1 << t) - 1
        assert _extend(mag, t) == v


def test_canonical_code_construction():
    """C.2: BITS=[0,2,3,...] yields codes 00,01 at len 2 then
    100,101,110 at len 3 — and the decoder table inverts them."""
    bits = [0, 2, 3] + [0] * 13
    vals = [7, 8, 20, 21, 22]
    codes = _canonical_codes(bits, vals)
    assert codes == {
        7: (0b00, 2), 8: (0b01, 2),
        20: (0b100, 3), 21: (0b101, 3), 22: (0b110, 3),
    }
    w = _BitWriter()
    for sym in (8, 22, 7):
        c, ln = codes[sym]
        w.write(c, ln)
    w.flush()
    t = _HuffTable(bits, vals)
    r = _BitReader(bytes(w.out), 0)
    assert [t.decode(r) for _ in range(3)] == [8, 22, 7]


def test_byte_stuffing_roundtrip():
    """An entropy byte of FF must be written as FF 00 and read back as
    data, never as a marker."""
    w = _BitWriter()
    w.write(0xFF, 8)
    w.write(0xA5, 8)
    w.flush()
    assert bytes(w.out) == b"\xff\x00\xa5"
    r = _BitReader(b"\xff\x00\xa5", 0)
    assert r.receive(8) == 0xFF and r.receive(8) == 0xA5
    with pytest.raises(ValueError):
        _BitReader(b"\xff\xd9", 0).read_bit()  # marker inside scan


def test_flat_block_dc_only():
    """A flat block quantizes to DC = 8·(v−128) with zero ACs, and the
    IDCT inverts it exactly — the gate's losslessness device."""
    for v in (0, 17, 128, 200, 255):
        coef = _fdct_quant([[v] * 8 for _ in range(8)], [1] * 64)
        assert coef[0] == 8 * (v - 128)
        assert coef[1:] == [0] * 63
        assert _idct_block(coef) == [[v] * 8 for _ in range(8)]


def test_idct_matches_independent_reference():
    """Random quantized blocks: encode→decode equals a numpy float
    FDCT/IDCT reference with the same spec rounding — pins the AC
    run-length layer and the IDCT beyond flat blocks (where the
    oracle gate has no coverage by construction)."""
    np = pytest.importorskip("numpy")
    C = np.array([1 / math.sqrt(2)] + [1.0] * 7)
    cos = np.array(
        [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
         for x in range(8)]
    )
    rng = np.random.RandomState(11)
    for trial in range(4):
        blk = rng.randint(0, 256, (8, 8))
        data = encode_jpeg([blk.tolist()])
        w, h, nc, planes = decode_jpeg(data)
        s = blk.astype(float) - 128
        S = np.zeros((8, 8))
        for v in range(8):
            for u in range(8):
                S[v, u] = (
                    C[u] * C[v] / 4
                    * np.sum(s * np.outer(cos[:, v], cos[:, u]))
                )
        Sq = np.sign(S) * np.floor(np.abs(S) + 0.5)
        rec = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                rec[y, x] = (
                    sum(
                        C[u] * C[v] / 4 * Sq[v, u] * cos[x, u] * cos[y, v]
                        for u in range(8)
                        for v in range(8)
                    )
                    + 128
                )
        ref = np.clip(np.floor(rec + 0.5), 0, 255).astype(int)
        assert (np.array(planes[0]) == ref).all()


def test_quant_tables_are_applied():
    """A non-trivial quant table must change the decoded block the way
    dequantization says (DC quant 2: 8·(v−128) rounds to nearest even
    step of 2/8=1/4 of a level... concretely v=129: DC=8 → q=4 → back
    8 → exact; v=130 DC=16 exact; v=129 with q=16: DC=8→round(0.5)=1
    →16 → pixel 130)."""
    q = [16] + [1] * 63
    data = encode_jpeg([[[129] * 8 for _ in range(8)]], quant_luma=q)
    w, h, nc, planes = decode_jpeg(data)
    # DC=8, /16 rounds half away → 1, dequant 16 → pixel 128+2=130
    assert planes[0] == [[130] * 8 for _ in range(8)]


def test_420_chroma_upsampling_geometry():
    """4:2:0: four flat Y blocks per MCU keep their own values; chroma
    decodes at half resolution and replicates 2×2."""
    Y = [
        [10 if x < 8 else 20 for x in range(16)] if y < 8
        else [30 if x < 8 else 40 for x in range(16)]
        for y in range(16)
    ]
    Cb = [[90] * 8 for _ in range(8)]
    Cr = [[170] * 8 for _ in range(8)]
    w, h, nc, planes = decode_jpeg(encode_jpeg([Y, Cb, Cr], "420"))
    assert planes[0] == Y
    assert planes[1] == [[90] * 16 for _ in range(16)]
    assert planes[2] == [[170] * 16 for _ in range(16)]


def test_subset_violations_raise():
    data = encode_jpeg([[[50] * 8 for _ in range(8)]])
    # extended sequential SOF1 (still out of subset; SOF2 is now IN)
    bad = data.replace(b"\xff\xc0", b"\xff\xc1", 1)
    with pytest.raises(ValueError, match="SOF1"):
        decode_jpeg(bad)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(data[:-20])
    with pytest.raises(ValueError, match="multiples"):
        encode_jpeg([[[1] * 12 for _ in range(8)]])
    # standalone markers in the header raise an explicit diagnostic
    # instead of being misparsed as length-bearing segments
    rst = data[:2] + b"\xff\xd3" + data[2:]
    with pytest.raises(ValueError, match="standalone"):
        decode_jpeg(rst)
    tem = data[:2] + b"\xff\x01" + data[2:]
    with pytest.raises(ValueError, match="standalone"):
        decode_jpeg(tem)


def test_fill_bytes_between_segments_are_skipped():
    """B.1.1.2: optional 0xFF fill bytes may precede any marker; the
    decoder must treat FF FF ... FF DB as one DQT marker."""
    data = encode_jpeg([[[93] * 8 for _ in range(8)]])
    padded = data[:2] + b"\xff\xff\xff" + data[2:]
    w, h, nc, planes = decode_jpeg(padded)
    assert planes[0] == [[93] * 8 for _ in range(8)]


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------

from jobinsight_data_pipeline_v2_spark.operators.jpeg import (  # noqa: E402
    _ENC_AC_BITS,
    _ENC_AC_BITS_PROG,
    _ENC_AC_VALS,
    _ENC_AC_VALS_PROG,
    _ENC_DC_BITS,
    _ENC_DC_VALS,
)

import struct  # noqa: E402


def _hand_headers(progressive: bool) -> bytearray:
    """SOI + DQT(all ones) + SOF + DHT for a 16×8 grayscale image,
    assembled byte-by-byte from the spec segment layouts (independent
    of encode_jpeg's segment writer)."""
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = 0xC2 if progressive else 0xC0
    seg(sof, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    ac_bits = _ENC_AC_BITS_PROG if progressive else _ENC_AC_BITS
    ac_vals = _ENC_AC_VALS_PROG if progressive else _ENC_AC_VALS
    dht = bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    seg(0xC4, dht)
    return out


def _sos(ns_comp: bytes, ss: int, se: int, ah: int, al: int) -> bytes:
    body = ns_comp + bytes([ss, se, (ah << 4) | al])
    return struct.pack(">BBH", 0xFF, 0xDA, len(body) + 2) + body


def test_progressive_hand_built_stream_golden():
    """Decoder golden with HAND-ASSEMBLED bits on both sides: the same
    two-block coefficient set (A: DC=5, c1=3, c2=−2; B: DC=−6, c20=1)
    is written once as a baseline stream and once as a 4-scan
    progressive stream (DC Al=1 + DC refine; AC first Al=1 with a
    cross-block EOB2 run; AC refine Al=0 with correction bits riding
    an EOB1 flush, a ZRL, and a newly-nonzero (3,1) insertion). Any
    misreading of the progressive entropy layer — DC point transform,
    EOBn counts including/excluding the current block, correction-bit
    order around ZRL — decodes different coefficients and breaks the
    pixel equality. No encoder code is exercised."""
    dc = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_b = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    ac_p = _canonical_codes(_ENC_AC_BITS_PROG, _ENC_AC_VALS_PROG)

    # --- baseline: one interleaved scan, both blocks in full ---
    base = _hand_headers(progressive=False)
    base += _sos(bytes([1, 1, 0x00]), 0, 63, 0, 0)
    w = _BitWriter()
    # block A: DC diff 5 (cat 3, mag 101)
    w.write(dc[3][0], 4)
    w.write(0b101, 3)
    w.write(ac_b[0x02][0], 8)  # (0,2) for c1=3
    w.write(0b11, 2)
    w.write(ac_b[0x02][0], 8)  # (0,2) for c2=-2 → mag 01
    w.write(0b01, 2)
    w.write(ac_b[0x00][0], 8)  # EOB
    # block B: DC diff −11 (cat 4, mag 0100)
    w.write(dc[4][0], 4)
    w.write(0b0100, 4)
    w.write(ac_b[0xF0][0], 8)  # ZRL (16 zeros)
    w.write(ac_b[0x31][0], 8)  # (3,1) → c20=1
    w.write(0b1, 1)
    w.write(ac_b[0x00][0], 8)  # EOB
    w.flush()
    base += bytes(w.out) + b"\xff\xd9"

    # --- progressive: DC first (Al=1), DC refine, AC first (Al=1),
    #     AC refine (Al=0) ---
    prog = _hand_headers(progressive=True)
    prog += _sos(bytes([1, 1, 0x00]), 0, 0, 0, 1)
    w = _BitWriter()
    w.write(dc[2][0], 4)   # A: 5>>1=2, diff 2 (cat 2)
    w.write(0b10, 2)
    w.write(dc[3][0], 4)   # B: -6>>1=-3, diff -5 (cat 3, mag 010)
    w.write(0b010, 3)
    w.flush()
    prog += bytes(w.out)
    prog += _sos(bytes([1, 1, 0x00]), 0, 0, 1, 0)
    w = _BitWriter()
    w.write(0b1, 1)        # A: 5 & 1
    w.write(0b0, 1)        # B: -6 & 1
    w.flush()
    prog += bytes(w.out)
    prog += _sos(bytes([1, 1, 0x00]), 1, 63, 0, 1)
    w = _BitWriter()
    w.write(ac_p[0x01][0], 8)  # A: (0,1) → c1 = 3>>1 = 1
    w.write(0b1, 1)
    w.write(ac_p[0x01][0], 8)  # A: (0,1) → c2 = -2>>1 = -1 (mag 0)
    w.write(0b0, 1)
    # A's tail + all of B (c20 vanishes at Al=1) → EOB run of 2
    w.write(ac_p[0x10][0], 8)  # EOB1 symbol: run 2^1 + ext
    w.write(0b0, 1)            # ext bit: 2 - 2 = 0
    w.flush()
    prog += bytes(w.out)
    prog += _sos(bytes([1, 1, 0x00]), 1, 63, 1, 0)
    w = _BitWriter()
    # block A: no newly-nonzero → whole band is one EOB1, with the
    # two history correction bits (c1: 3&1=1, c2: 2&1=0) appended
    w.write(ac_p[0x00][0], 8)  # EOB (run 1, includes current block)
    w.write(0b1, 1)            # c1 correction
    w.write(0b0, 1)            # c2 correction
    # block B: 19 zero-history before c20 → ZRL + (3,1) with sign 1
    w.write(ac_p[0xF0][0], 8)
    w.write(ac_p[0x31][0], 8)
    w.write(0b1, 1)
    # B's tail → final EOB1
    w.write(ac_p[0x00][0], 8)
    w.flush()
    prog += bytes(w.out) + b"\xff\xd9"

    wb, hb, ncb, planes_b = decode_jpeg(bytes(base))
    wp, hp, ncp, planes_p = decode_jpeg(bytes(prog))
    assert (wb, hb, ncb) == (16, 8, 1) == (wp, hp, ncp)
    assert planes_b == planes_p
    # sanity: the coefficients actually landed (non-flat image)
    flat_vals = {v for row in planes_b[0] for v in row}
    assert len(flat_vals) > 2


def test_progressive_encoding_decodes_identically_to_baseline():
    """encode_jpeg(progressive=True) transmits the same quantized
    coefficients through the SOF2 scan script — decoding must be
    pixel-identical to the baseline encoding of the same planes, for
    grayscale, 4:4:4 and 4:2:0, on random (non-flat) content."""
    import random

    rng = random.Random(19)

    def rand_plane(h, w):
        return [[rng.randrange(256) for _ in range(w)] for _ in range(h)]

    cases = [
        ([rand_plane(16, 16)], "444"),
        ([rand_plane(16, 24), rand_plane(16, 24), rand_plane(16, 24)],
         "444"),
        ([rand_plane(32, 16), rand_plane(16, 8), rand_plane(16, 8)],
         "420"),
    ]
    for planes, sub in cases:
        b = decode_jpeg(encode_jpeg(planes, sub))
        p = decode_jpeg(encode_jpeg(planes, sub, progressive=True))
        assert b == p


def test_progressive_flat_mcu_is_bit_exact():
    """The gate's losslessness device holds through the progressive
    path too: flat MCUs under all-ones quant decode to their exact
    input values (DC split across Al levels reassembles exactly)."""
    Y = [[37 if x < 16 else 201 for x in range(32)] for _ in range(16)]
    Cb = [[90 if x < 8 else 60 for x in range(16)] for _ in range(8)]
    Cr = [[170] * 16 for _ in range(8)]
    w, h, nc, planes = decode_jpeg(
        encode_jpeg([Y, Cb, Cr], "420", progressive=True)
    )
    assert planes[0] == Y
    assert planes[1][0][15] == 90 and planes[1][0][16] == 60
    assert planes[2] == [[170] * 32 for _ in range(16)]


def test_progressive_scan_script_structure():
    """The SOF2 stream carries the declared scan script: DC first +
    DC refine + per-component (2 bands × first + 2 refinement
    levels), with single-component AC scans and decreasing Al."""
    planes = [[[(x * 7 + y * 3) % 256 for x in range(16)]
               for y in range(16)] for _ in range(3)]
    data = encode_jpeg(planes, "444", progressive=True)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    scans = []
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        m = data[pos + 1]
        if m == 0xD9:
            break
        if m in (0x00,) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if m == 0xDA:
            body = data[pos + 4 : pos + 2 + ln]
            ns = body[0]
            ss, se, ahl = body[1 + ns * 2 : 4 + ns * 2]
            scans.append((ns, ss, se, ahl >> 4, ahl & 0xF))
            # skip entropy data up to the next marker
            p = pos + 2 + ln
            while p + 1 < len(data) and not (
                data[p] == 0xFF and data[p + 1] not in (0x00,)
            ):
                p += 1
            pos = p
            continue
        pos += 2 + ln
    assert scans[0] == (3, 0, 0, 0, 1)      # DC first, interleaved
    assert scans[1] == (3, 0, 0, 1, 0)      # DC refine
    ac = scans[2:]
    assert len(ac) == 18 and all(s[0] == 1 for s in ac)
    assert [s[3:] for s in ac] == [(0, 2)] * 6 + [(2, 1)] * 6 + [(1, 0)] * 6
    assert {s[1:3] for s in ac} == {(1, 5), (6, 63)}


def test_decode_image_dispatches_jpeg():
    """multimodal.decode_image: JPEG magic bytes route to the JPEG
    codec and convert through the rounded BT.601 surface."""
    from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
        decode_image,
    )

    Y = [[100] * 8 for _ in range(8)]
    Cb = [[120] * 8 for _ in range(8)]
    Cr = [[140] * 8 for _ in range(8)]
    feats = decode_image(encode_jpeg([Y, Cb, Cr], "444"))
    r, g, b = ycbcr_to_rgb(100, 120, 140)
    assert feats[:3] == [8.0, 8.0, 3.0]
    assert feats[3:] == [float(r), float(g), float(b)]
    # grayscale path
    g8 = decode_image(encode_jpeg([[[77] * 8 for _ in range(8)]]))
    assert g8 == [8.0, 8.0, 1.0, 77.0]


def test_ycbcr_to_rgb_spec_points():
    """BT.601 full-range anchors: gray axis is identity, pure Cr/Cb
    offsets hit the rounded formula values."""
    assert ycbcr_to_rgb(0, 128, 128) == (0, 0, 0)
    assert ycbcr_to_rgb(255, 128, 128) == (255, 255, 255)
    assert ycbcr_to_rgb(128, 128, 228) == (255, 57, 128)  # R clamps
    assert ycbcr_to_rgb(50, 255, 128) == (50, 6, 255)


def test_scanless_jpeg_raises_not_gray():
    """Review r9: a file with SOF+EOI but NO SOS must raise — the
    coefficient store exists from SOF on, and keying the guard on it
    would fabricate an all-gray image from zero coefficients."""
    data = encode_jpeg([[[50] * 8 for _ in range(8)]])
    # strip the SOS segment + entropy data: keep everything up to the
    # SOS marker, then append EOI
    sos = data.index(b"\xff\xda")
    with pytest.raises(ValueError, match="missing SOS"):
        decode_jpeg(data[:sos] + b"\xff\xd9")


def test_restart_intervals_roundtrip_and_reset():
    """DRI/RSTn: every (baseline|progressive) × (444|420) combination
    decodes pixel-identically with restart intervals 1..3 to the
    no-restart stream (markers consumed at MCU boundaries, DC
    predictors and EOB runs reset); a wrong restart index raises; the
    stream really carries DRI + cycling RST markers."""
    import random

    rng = random.Random(7)

    def rp(h, w):
        return [[rng.randrange(256) for _ in range(w)] for _ in range(h)]

    cases = [
        ([rp(16, 24)], "444", False),
        ([rp(16, 24)], "444", True),
        ([rp(32, 16), rp(16, 8), rp(16, 8)], "420", True),
    ]
    for planes, sub, prog in cases:
        base = decode_jpeg(encode_jpeg(planes, sub, progressive=prog))
        for ri in (1, 2, 3):
            got = decode_jpeg(
                encode_jpeg(planes, sub, progressive=prog,
                            restart_interval=ri)
            )
            assert got == base, (sub, prog, ri)
    data = encode_jpeg(cases[0][0], "444", restart_interval=1)
    assert b"\xff\xdd" in data
    # markers cycle RST0, RST1, ... within the scan
    i0 = data.index(b"\xff\xd0")
    assert b"\xff\xd1" in data[i0:]
    bad = bytearray(data)
    bad[data.index(b"\xff\xd0") + 1] = 0xD5
    with pytest.raises(ValueError, match="expected RST"):
        decode_jpeg(bytes(bad))
