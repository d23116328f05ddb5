"""Stdlib PNG codec tests: spec micro-goldens (filter bytes hand-derived
from the PNG spec §6, independently of the implementation), encode↔
decode roundtrips across every filter type and color type, corruption
errors, and the Spark-side decode_image path. The goldens pin BOTH
directions separately, so a compensating predictor bug (same wrong
predictor in filter and unfilter) cannot hide inside the roundtrip.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from jobinsight_data_pipeline_v2_spark.operators.png import (
    CHANNELS,
    decode_png,
    encode_png,
)

SF = "/root/testdata/sf0.001"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_from_raw(w: int, h: int, ctype: int, raw: bytes) -> bytes:
    """Assemble a PNG from an already-filtered raw stream — built here
    with test-local framing code, independent of encode_png."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


# 3x3 grayscale pixels used by the Sub/Up/Average golden
_G9 = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
# Hand-derived filtered stream (spec §6.3-6.5):
#   row0 Sub:     10-0, 20-10, 30-20            -> 1, 10 10 10
#   row1 Up:      40-10, 50-20, 60-30           -> 2, 30 30 30
#   row2 Average: 70-(0+40)//2, 80-(70+50)//2,
#                 90-(80+60)//2                 -> 3, 50 20 20
_G9_RAW = bytes([1, 10, 10, 10, 2, 30, 30, 30, 3, 50, 20, 20])

# 2x2 RGB pixels used by the Paeth golden
_RGB4 = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
# row0 None; row1 Paeth (spec §6.6):
#   x<3:  pred = paeth(0, up, 0) = up           -> 7-1, 8-2, 9-3 = 6 6 6
#   x>=3: p = left+up-ul; |p-left|=3 smallest   -> pred = left
#         10-7, 11-8, 12-9 = 3 3 3
_RGB4_RAW = bytes([0, 1, 2, 3, 4, 5, 6, 4, 6, 6, 6, 3, 3, 3])


def test_decode_matches_spec_goldens():
    w, h, ch, px = decode_png(_png_from_raw(3, 3, 0, _G9_RAW))
    assert (w, h, ch) == (3, 3, 1)
    assert px == _G9
    w, h, ch, px = decode_png(_png_from_raw(2, 2, 2, _RGB4_RAW))
    assert (w, h, ch) == (2, 2, 3)
    assert px == _RGB4


def test_encode_matches_spec_goldens():
    """The encoder's filtered raw stream must equal the hand-derived
    bytes — checked by unwrapping its IDAT with test-local code."""

    def idat_raw(payload: bytes) -> bytes:
        pos, idat = 8, bytearray()
        while pos < len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += payload[pos + 8 : pos + 8 + length]
            pos += 12 + length
        return zlib.decompress(bytes(idat))

    enc = encode_png(3, 3, _G9, color_type=0, filters=[1, 2, 3])
    assert idat_raw(enc) == _G9_RAW
    enc = encode_png(2, 2, _RGB4, color_type=2, filters=[0, 4])
    assert idat_raw(enc) == _RGB4_RAW


@pytest.mark.parametrize("ctype", sorted(CHANNELS))
@pytest.mark.parametrize("ftype", range(5))
def test_roundtrip_every_filter_and_color_type(ctype, ftype):
    ch = CHANNELS[ctype]
    w, h = 7, 5
    px = bytes((11 * i + 3 * (i % ch) + i // (w * ch)) % 256
               for i in range(w * h * ch))
    payload = encode_png(w, h, px, color_type=ctype,
                         filters=lambda y: ftype)
    assert decode_png(payload) == (w, h, ch, px)


def test_roundtrip_mixed_filters_wide_values():
    """All five filters in one image, pixel values spanning 0..255 so
    the modular +/- 256 wraparound paths execute."""
    w, h = 16, 10
    px = bytes((37 * i) % 256 for i in range(w * h * 3))
    payload = encode_png(w, h, px, color_type=2, filters=lambda y: y % 5)
    assert decode_png(payload) == (w, h, 3, px)


def test_decode_rejects_corruption():
    good = encode_png(4, 4, bytes(range(48)), color_type=2)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    flipped = bytearray(good)
    flipped[40] ^= 0xFF  # inside IDAT data -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(flipped))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(good[:30])
    with pytest.raises(ValueError, match="filter type"):
        decode_png(_png_from_raw(2, 1, 0, bytes([7, 1, 2])))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(_png_from_raw(2, 2, 0, bytes([0, 1, 2])))


def test_decode_rejects_out_of_subset():
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr16)
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr_i)
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bad)


def test_decode_multiple_idat_chunks():
    """The IDAT zlib stream may be split across chunks at any byte."""
    raw = bytes([0, 10, 20, 0, 30, 40])
    comp = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp[:5])
        + _chunk(b"IDAT", comp[5:])
        + _chunk(b"IEND", b"")
    )
    assert decode_png(payload) == (2, 2, 1, bytes([10, 20, 30, 40]))


def test_decode_image_feature_vector():
    """decode_image: [w, h, ch, channel means] from a real PNG."""
    from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
        decode_image,
    )

    px = bytes([100, 0, 200, 0] * 6)  # 4x3 gray+alpha
    feats = decode_image(encode_png(4, 3, px, color_type=4,
                                    filters=lambda y: y + 1))
    assert feats[:3] == [4.0, 3.0, 2.0]
    assert feats[3] == pytest.approx((100 + 200) * 6 / 12)
    assert feats[4] == 0.0
    with pytest.raises(ValueError):
        decode_image(b"not a png at all")


def test_decode_image_cross_checked_against_pil():
    """Where PIL exists, the stdlib decoder must agree with libpng on
    PIL-encoded images (skips cleanly in this container)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.new("RGB", (9, 7))
    img.putdata([((5 * i) % 256, (7 * i) % 256, (11 * i) % 256)
                 for i in range(63)])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    w, h, ch, px = decode_png(buf.getvalue())
    assert (w, h, ch) == (9, 7, 3)
    assert px == bytes(v for p in img.getdata() for v in p)


def test_extract_features_with_real_decode(spark):
    """Spark-side: PNG payloads through extract_features(decode_image)
    — Arrow batches on executors, corrupt payload quarantined as NULL
    features."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
        decode_image,
        extract_features,
    )

    rows = []
    for i in range(1, 21):
        w, h = 3 + i % 5, 3 + i % 3
        px = bytes((i * 13 + j) % 256 for j in range(w * h * 3))
        rows.append((i, "image", bytearray(encode_png(
            w, h, px, color_type=2, filters=lambda y: (y + i) % 5)),
            "image/png", "synth", float(w), float(h)))
    rows.append((99, "image", bytearray(b"corrupt bytes"),
                 "image/png", "synth", -1.0, -1.0))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "source string, exp_w double, exp_h double",
    )
    feats = extract_features(
        media.select("media_id", "kind", "payload", "mime", "source"),
        decode_fn=decode_image,
    )
    got = {r["media_id"]: r["features"] for r in feats.collect()}
    assert got[99] is None  # corrupt payload -> quarantined
    for r in rows[:-1]:
        assert got[r[0]][0] == r[5] and got[r[0]][1] == r[6]
    # content addressing still works over PNG bytes
    n = feats.filter(F.length(F.col("content_sha256")) == 64).count()
    assert n == 21


def test_bmp_spec_goldens():
    """Each direction pinned independently against hand-assembled
    bytes (the png.py discipline — compensating bugs cannot hide in
    round trips): a 2x1 image, red then green, bottom-up storage with
    2 pad bytes per row."""
    import struct

    from jobinsight_data_pipeline_v2_spark.operators.bmp import (
        decode_bmp,
        encode_bmp,
    )

    rgb = bytes((255, 0, 0, 0, 255, 0))  # red, green (top-down RGB)
    enc = encode_bmp(2, 1, rgb)
    # header goldens
    assert enc[:2] == b"BM"
    assert struct.unpack_from("<I", enc, 10)[0] == 54  # pixel offset
    assert struct.unpack_from("<i", enc, 18)[0] == 2  # width
    assert struct.unpack_from("<i", enc, 22)[0] == 1  # height
    assert struct.unpack_from("<H", enc, 28)[0] == 24  # bpp
    # pixel golden: BGR order + 2 pad bytes to the 4-byte stride
    assert enc[54:62] == bytes((0, 0, 255, 0, 255, 0, 0, 0))

    # decode golden from hand-assembled bytes (NOT the encoder's)
    hand = (
        b"BM" + struct.pack("<IHHI", 62, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, 8, 0, 0, 0, 0)
        + bytes((0, 0, 255, 0, 255, 0, 0, 0))
    )
    assert decode_bmp(hand) == (2, 1, 3, rgb)

    # top-down (negative height) variant decodes identically
    hand_td = (
        b"BM" + struct.pack("<IHHI", 62, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 24, 0, 8, 0, 0, 0, 0)
        + bytes((0, 0, 255, 0, 255, 0, 0, 0))
    )
    assert decode_bmp(hand_td) == (2, 1, 3, rgb)


def test_bmp_roundtrip_and_rejects():
    import pytest

    from jobinsight_data_pipeline_v2_spark.operators.bmp import (
        decode_bmp,
        encode_bmp,
    )

    rgb = bytes((i * 7) % 256 for i in range(5 * 3 * 3))  # 5x3
    assert decode_bmp(encode_bmp(5, 3, rgb)) == (5, 3, 3, rgb)
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp")
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(5, 3, rgb)[:-4])  # truncated pixels
    # 8-bit palette profile is out of scope and must raise loudly
    import struct as _s

    pal = (
        b"BM" + _s.pack("<IHHI", 100, 0, 0, 54)
        + _s.pack("<IiiHHIIiiII", 40, 2, 1, 1, 8, 0, 8, 0, 0, 0, 0)
        + b"\x00" * 46
    )
    with pytest.raises(ValueError):
        decode_bmp(pal)


def test_decode_image_dispatches_bmp(spark):
    """extract_features with the REAL decode_image over a BMP payload:
    features = [w, h, 3, mean_r, mean_g, mean_b]."""
    from jobinsight_data_pipeline_v2_spark.operators.bmp import encode_bmp
    from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
        decode_image,
        extract_features,
    )

    rgb = bytes((10, 20, 30, 50, 60, 70))  # 2x1
    payload = encode_bmp(2, 1, rgb)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload)), (2, "image", bytearray(b"junk"))],
        "media_id long, kind string, payload binary",
    )
    rows = {
        r.media_id: r
        for r in extract_features(media, decode_fn=decode_image).collect()
    }
    assert rows[1].features == [2.0, 1.0, 3.0, 30.0, 40.0, 50.0]
    assert rows[2].features is None  # junk quarantines as NULL


def test_bmp_rejects_offset_inside_headers():
    """A corrupt pixel offset pointing into the headers must raise,
    not decode header bytes as pixels (review r7 s5)."""
    import struct

    import pytest

    from jobinsight_data_pipeline_v2_spark.operators.bmp import decode_bmp

    bad = (
        b"BM" + struct.pack("<IHHI", 62, 0, 0, 14)  # offset 14 < 54
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, 8, 0, 0, 0, 0)
        + bytes(8)
    )
    with pytest.raises(ValueError):
        decode_bmp(bad)
