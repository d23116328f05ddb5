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


# ---------------------------------------------------------------------------
# animated GIF89a (r11): compositing, transparency, disposal subset
# ---------------------------------------------------------------------------

from jobinsight_data_pipeline_v2_spark.operators.gif import (  # noqa: E402
    decode_gif_frames,
    encode_animated_gif,
    gif_frame_splitter,
)


def _px(rgb: bytes, w: int, x: int, y: int) -> tuple[int, int, int]:
    i = 3 * (y * w + x)
    return rgb[i], rgb[i + 1], rgb[i + 2]


def test_animated_hand_assembled_container():
    """The decoder pinned against a HAND-ASSEMBLED GIF89a container
    (header, GCT, graphic-control blocks, sub-rect descriptor bytes
    all written out explicitly — only the LZW pixel streams come from
    the already-golden-pinned encoder): 2×2 canvas, 4-color GCT,
    bg index 3; frame 0 full [[0,1],[2,3]] disposal-2 delay 5;
    frame 1 a 1×1 rect at (1,1) painting index 1, delay 7."""
    pal = bytes((0, 0, 0, 10, 10, 10, 20, 20, 20, 30, 30, 30))
    g = bytearray()
    g += b"GIF89a"
    g += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    g.append(0x80 | 0x01)  # GCT present, 2^(1+1)=4 entries
    g.append(3)  # background index
    g.append(0)  # aspect
    g += pal
    # frame 0: GCE disposal=2, delay=5, no transparency
    g += bytes((0x21, 0xF9, 0x04, 2 << 2, 5, 0, 0, 0))
    g += bytes((0x2C, 0, 0, 0, 0, 2, 0, 2, 0, 0x00))  # full 2×2 rect
    g.append(2)  # LZW min code size
    stream = _lzw_encode(bytes((0, 1, 2, 3)), 2)
    g.append(len(stream))
    g += stream
    g.append(0)
    # frame 1: GCE disposal=0, delay=7, transparent idx 2 (unused)
    g += bytes((0x21, 0xF9, 0x04, 0x01, 7, 0, 2, 0))
    g += bytes((0x2C, 1, 0, 1, 0, 1, 0, 1, 0, 0x00))  # 1×1 at (1,1)
    g.append(2)  # LZW min code size
    stream = _lzw_encode(bytes((1,)), 2)
    g.append(len(stream))
    g += stream
    g.append(0)
    g.append(0x3B)

    w, h, frames = decode_gif_frames(bytes(g))
    assert (w, h) == (2, 2)
    assert [d for d, _ in frames] == [5, 7]
    f0, f1 = frames[0][1], frames[1][1]
    assert [_px(f0, 2, x, y) for y in (0, 1) for x in (0, 1)] == [
        (0, 0, 0), (10, 10, 10), (20, 20, 20), (30, 30, 30)
    ]
    # disposal 2 on frame 0 restored the WHOLE canvas to bg index 3,
    # then frame 1 painted only (1,1)
    assert [_px(f1, 2, x, y) for y in (0, 1) for x in (0, 1)] == [
        (30, 30, 30), (30, 30, 30), (30, 30, 30), (10, 10, 10)
    ]


def test_animated_roundtrip_transparency_and_disposal():
    """Sub-rect pastes, transparent pixels showing prior content, and
    restore-to-background — the gate's compositing semantics through
    our own encoder."""
    pal = [(i, 255 - i, i // 2) for i in range(256)]
    grad = bytes(10 + x + y for y in range(3) for x in range(4))
    f0 = (0, 0, 4, 3, grad, 10, 0, None, False)
    f1 = (0, 0, 4, 1, bytes((254, 7, 254, 7)), 20, 2, 7, False)
    f2 = (0, 1, 4, 1, bytes((253,) * 4), 30, 0, None, False)
    w, h, frames = decode_gif_frames(
        encode_animated_gif(4, 3, [f0, f1, f2], pal, bg_index=255)
    )
    assert (w, h, len(frames)) == (4, 3, 3)
    assert [d for d, _ in frames] == [10, 20, 30]
    reds = [
        [rgb[i] for i in range(0, len(rgb), 3)] for _, rgb in frames
    ]
    assert reds[0] == [10, 11, 12, 13, 11, 12, 13, 14, 12, 13, 14, 15]
    # odd-x transparent: the gradient shows through
    assert reds[1] == [254, 11, 254, 13, 11, 12, 13, 14, 12, 13, 14, 15]
    # frame 1's disposal-2 restored row 0 to bg (index 255) before f2
    assert reds[2] == [255, 255, 255, 255, 253, 253, 253, 253,
                       12, 13, 14, 15]


def test_animated_interlaced_first_frame():
    pal = [(i, i, i) for i in range(256)]
    rows = bytes(r for r in range(10) for _ in range(4))
    f0 = (0, 0, 4, 10, rows, 1, 0, None, True)
    _, _, frames = decode_gif_frames(
        encode_animated_gif(4, 10, [f0], pal)
    )
    rgb = frames[0][1]
    for r in range(10):
        assert rgb[3 * r * 4] == r, f"display row {r} wrong"


def test_disposal_restore_previous_raises():
    pal = [(i, i, i) for i in range(8)]
    with pytest.raises(ValueError, match="disposal"):
        encode_animated_gif(
            2, 2, [(0, 0, 2, 2, bytes(4), 1, 3, None, False)], pal
        )
    # decoder side: flip a valid file's GCE disposal bits to 3
    raw = bytearray(
        encode_animated_gif(
            2, 2, [(0, 0, 2, 2, bytes(4), 1, 0, None, False)], pal
        )
    )
    i = raw.index(bytes((0x21, 0xF9, 0x04)))
    raw[i + 3] |= 3 << 2
    with pytest.raises(ValueError, match="disposal"):
        decode_gif_frames(bytes(raw))


def test_animated_truncated_between_frames_raises():
    """Review r11 (repro-confirmed): a payload cut between frames
    (losing later frames and the 0x3B trailer) must raise, never
    return a silent prefix of the animation."""
    pal = [(i, i, i) for i in range(8)]
    f = (0, 0, 2, 2, bytes((0, 1, 2, 3)), 1, 0, None, False)
    raw = encode_animated_gif(2, 2, [f, f], pal)
    # find the second frame's graphic control and cut just before it
    second = raw.index(b"\x21\xf9\x04", raw.index(b"\x21\xf9\x04") + 1)
    with pytest.raises(ValueError, match="trailer"):
        decode_gif_frames(raw[:second])
    # cutting only the trailer byte also raises
    with pytest.raises(ValueError, match="trailer"):
        decode_gif_frames(raw[:-1])
    # the intact file still decodes both frames
    assert len(decode_gif_frames(raw)[2]) == 2


def test_animated_rect_outside_canvas_raises():
    pal = [(i, i, i) for i in range(8)]
    with pytest.raises(ValueError, match="rect"):
        encode_animated_gif(
            2, 2, [(1, 1, 2, 2, bytes(4), 1, 0, None, False)], pal
        )


def test_decode_gif_frames_single_frame_matches_decode_gif():
    idx = bytes(range(36))
    g = encode_gif(6, 6, idx, _GRAY)
    w, h, frames = decode_gif_frames(g)
    assert (w, h, len(frames)) == (6, 6, 1)
    assert frames[0][1] == decode_gif(g)[3]


def test_gif_frame_splitter_fan_out(spark):
    """The sample_frames 1→N fan-out (the y4m device) over animated
    GIF payloads: one row per sampled composited frame, n_bytes =
    3·w·h canvas RGB."""
    from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
        sample_frames,
    )

    pal = [(i, i, i) for i in range(256)]
    grad = bytes((x + y) % 8 for y in range(3) for x in range(4))
    frames = [(0, 0, 4, 3, grad, 1, 0, None, False)] + [
        (0, 0, 4, 1, bytes((f,) * 4), 1, 0, None, False)
        for f in range(1, 4)
    ]
    raw = encode_animated_gif(4, 3, frames, pal)
    media = spark.createDataFrame(
        [(1, bytearray(raw))], "media_id long, payload binary"
    )
    rows = sample_frames(
        media, every_n=2, split_fn=gif_frame_splitter
    ).collect()
    assert [r.frame_idx for r in rows] == [0, 2]
    assert all(r.n_bytes == 3 * 4 * 3 for r in rows)
