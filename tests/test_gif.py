"""GIF/LZW codec (operators/gif.py): hand-packed bit goldens (the
zigzag lesson — pin scan-order/bit-order code against a transcription,
never only a roundtrip), a REAL external GIF byte string, framing
behaviors, and the width-schedule stress."""

from __future__ import annotations

import base64
import hashlib

import pytest

from jobinsight_data_pipeline_v2_spark.operators.gif import (
    _interlace_order,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)

_GRAY = [(i, i, i) for i in range(256)]

# the canonical 1x1 transparent-pixel GIF89a that ships in a thousand
# tracking pixels — an EXTERNAL reality pin (2-bit code path, GCE
# extension block, 89a header)
_ONE_PX = "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"


def test_lzw_hand_packed_golden():
    """mcs=2, pixels [1,1,1] → codes CLEAR(4),1,6,EOI(5) at 3 bits,
    LSB-first → exactly 0x8C 0x0B (hand-packed)."""
    assert _lzw_encode(bytes([1, 1, 1]), 2) == bytes([0x8C, 0x0B])
    assert _lzw_decode(bytes([0x8C, 0x0B]), 2, 3) == bytes([1, 1, 1])


def test_lzw_kwkwk_case():
    """'aaaa' forces the code==next_code (KwKwK) branch: codes
    CLEAR, a, next_code(=prev+prev[0]), EOI."""
    data = bytes([0, 0, 0, 0])
    assert _lzw_decode(_lzw_encode(data, 2), 2, 4) == data


def test_external_one_pixel_gif():
    w, h, ch, rgb = decode_gif(base64.b64decode(_ONE_PX))
    assert (w, h, ch) == (1, 1, 3)
    assert rgb == b"\x00\x00\x00"  # palette index 0 = black


def test_roundtrip_gradient():
    w, h = 17, 9
    idx = bytes((x + y + 7) % 256 for y in range(h) for x in range(w))
    dw, dh, ch, rgb = decode_gif(encode_gif(w, h, idx, _GRAY))
    assert (dw, dh, ch) == (w, h, 3)
    assert bytes(rgb[3 * i] for i in range(w * h)) == idx


def test_roundtrip_small_palette():
    """4-color table: bits=2 path with a non-gray palette."""
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0, 1, 2, 0, 3])
    dw, dh, ch, rgb = decode_gif(encode_gif(4, 3, idx, pal))
    assert (dw, dh) == (4, 3)
    assert rgb[:3] == bytes(pal[0]) and rgb[9:12] == bytes(pal[3])


def test_width_schedule_and_clear_stress():
    """Pseudo-random indices force the dictionary through every width
    step (9→12 bits) and past 4096 (mid-stream CLEAR + reset). A
    matched encoder/decoder off-by-one in the width schedule would
    desynchronize exactly at a step boundary and fail here with
    garbage long before the end."""
    big = bytes(
        hashlib.md5(str(i // 16).encode()).digest()[i % 16]
        for i in range(120_000)
    )
    assert _lzw_decode(_lzw_encode(big, 8), 8, len(big)) == big


def test_interlace_order_spec():
    """The Haeberli 4-pass table, transcribed from the GIF spec
    (appendix E): pass 1 = rows 0 mod 8, pass 2 = 4 mod 8, pass 3 =
    2 mod 4, pass 4 = odd rows — pinned by hand, not by the code's
    own roundtrip (the zigzag lesson)."""
    assert _interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert _interlace_order(8) == [0, 4, 2, 6, 1, 3, 5, 7]
    assert _interlace_order(5) == [0, 4, 2, 1, 3]
    assert _interlace_order(1) == [0]


def test_interlaced_roundtrip_and_flag():
    w, h = 6, 10
    idx = bytes((x + 3 * y) % 256 for y in range(h) for x in range(w))
    g = encode_gif(w, h, idx, _GRAY, interlace=True)
    # descriptor flag set: header(6)+LSD(7)+GCT(768)+9 into the file
    assert g[6 + 7 + 768 + 9] & 0x40
    dw, dh, ch, rgb = decode_gif(g)
    assert (dw, dh, ch) == (w, h, 3)
    assert bytes(rgb[3 * i] for i in range(w * h)) == idx
    # the encoder really permuted: the stored pixel stream differs
    # from the sequential encoding of the same image
    assert g != encode_gif(w, h, idx, _GRAY)


def test_interlaced_decoder_hand_assembled():
    """Decoder pinned INDEPENDENTLY of the encoder's permute: rows are
    hand-permuted into the spec storage order [0,8,4,2,6,1,3,5,7,9],
    encoded sequentially, and only the descriptor flag is flipped —
    decode must return display order."""
    w, h = 4, 10
    spec_order = [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    stored = b"".join(bytes([r] * w) for r in spec_order)
    g = bytearray(encode_gif(w, h, stored, _GRAY))
    g[6 + 7 + 768 + 9] |= 0x40
    dw, dh, ch, rgb = decode_gif(bytes(g))
    assert (dw, dh) == (w, h)
    for r in range(h):
        row = rgb[3 * r * w : 3 * (r + 1) * w : 3]
        assert row == bytes([r] * w), f"display row {r} wrong"


def test_truncated_stream_raises():
    g = encode_gif(6, 6, bytes(range(36)), _GRAY)
    with pytest.raises(ValueError):
        decode_gif(g[: len(g) - 6])


def test_decode_image_dispatch_gif():
    from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
        decode_image,
    )

    idx = bytes([5] * 8)
    feats = decode_image(encode_gif(4, 2, idx, _GRAY))
    assert feats[:3] == [4.0, 2.0, 3.0]
    assert feats[3] == pytest.approx(5.0)
