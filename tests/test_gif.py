"""GIF/LZW codec (operators/gif.py): hand-packed bit goldens (the
zigzag lesson — pin scan-order/bit-order code against a transcription,
never only a roundtrip), a REAL external GIF byte string, framing
behaviors, and the width-schedule stress."""

from __future__ import annotations

import base64
import hashlib

import pytest

from jobinsight_data_pipeline_v2_spark.operators.gif import (
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


def test_interlaced_raises():
    g = bytearray(encode_gif(4, 3, bytes(12), _GRAY))
    # image descriptor starts after header(6)+LSD(7)+GCT(768)
    ip = 6 + 7 + 768 + 9  # packed byte of the image descriptor
    g[ip] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(g))


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
