"""Pure-stdlib BMP codec (uncompressed 24-bit BI_RGB).

The second image format behind operators/multimodal.decode_image
(VERDICT r6 asked for PNG/BMP; PNG needs zlib, BMP needs nothing).
Supports the overwhelmingly-common on-disk profile: BITMAPINFOHEADER
(40 bytes), 24 bits per pixel, BI_RGB (no compression), bottom-up or
top-down row order. Everything else raises — corrupt/unsupported
payloads surface as NULL features per the quarantine convention.

decode_bmp returns the SAME contract as png.decode_png:
(width, height, channels, pixel bytes in row-major TOP-DOWN RGB), so
the feature extractor upstream is format-agnostic. Encode and decode
are implemented independently and each pinned by spec micro-goldens
(compensating bugs cannot hide in round trips — the png.py
discipline).
"""

from __future__ import annotations

import struct

_HDR_FILE = 14
_HDR_INFO = 40


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """RGB row-major top-down bytes → 24-bit BI_RGB bottom-up BMP."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    row = width * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        r = rgb[y * row : (y + 1) * row]
        # RGB → BGR per pixel
        for x in range(width):
            body += bytes(
                (r[x * 3 + 2], r[x * 3 + 1], r[x * 3])
            )
        body += b"\x00" * pad
    off = _HDR_FILE + _HDR_INFO
    size = off + len(body)
    head = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII",
        _HDR_INFO, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return head + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """BMP bytes → (width, height, 3, RGB row-major top-down)."""
    if len(payload) < _HDR_FILE + _HDR_INFO or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, width, height_raw, planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, _HDR_FILE
    )
    if hdr_size < _HDR_INFO:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if off < _HDR_FILE + hdr_size:
        # a pixel offset pointing INTO the headers would silently
        # decode header bytes as pixels (review r7 s5) — quarantine
        raise ValueError(f"BMP pixel offset {off} inside the headers")
    if planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP profile (planes={planes}, bpp={bpp}, "
            f"compression={comp}) — only 24-bit BI_RGB is implemented"
        )
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if width <= 0 or height <= 0:
        raise ValueError("non-positive BMP dimensions")
    row = width * 3
    stride = row + ((-row) % 4)
    need = off + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        base = off + src_y * stride
        dst = y * row
        for x in range(width):
            b, g, r = payload[base + x * 3 : base + x * 3 + 3]
            out[dst + x * 3 : dst + x * 3 + 3] = bytes((r, g, b))
    return width, height, 3, bytes(out)
