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
    # progressive SOF2
    bad = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bad)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(data[:-20])
    with pytest.raises(ValueError, match="multiples"):
        encode_jpeg([[[1] * 12 for _ in range(8)]])


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
