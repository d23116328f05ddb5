"""Pure-stdlib PNG codec: the real media decode for the multimodal path.

The container has no codec library (PIL/libpng), but PNG's baseline
profile needs nothing beyond ``zlib`` + the five scanline filter
algorithms (RFC 2083 / W3C PNG spec §6): signature, chunk framing with
CRC-32, IHDR, concatenated IDAT zlib stream, per-scanline filter
reversal (None/Sub/Up/Average/Paeth). This module implements both
directions for the baseline subset used by training-data pipelines'
thumbnail-scale work:

- 8-bit depth; color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA)
- non-interlaced only (Adam7 raises)
- multiple IDAT chunks supported; CRCs verified

``decode_png`` is what runs at the Arrow edge inside
``operators.multimodal.extract_features`` (mapInPandas — the sanctioned
Python surface); the per-scanline loops are pure Python, which is fine
at gate/thumbnail sizes and honest about needing a native codec for
production-resolution frames (the Spark-side contract — schema,
batching, partitioning — is identical either way).

``encode_png`` is the deterministic synthesizer used by tests and the
``png_decode_stats`` gate; its per-row ``filters`` argument lets a
single image exercise every filter type, so the gate pins the whole
filter algebra, not just the happy path. The filter and unfilter
directions are implemented independently (encoder subtracts predictors
computed from ORIGINAL pixels; decoder adds predictors computed from
RECONSTRUCTED pixels) and the test suite hand-computes spec micro-
goldens, so a compensating predictor bug cannot hide in the roundtrip.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c, ties left > up > up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → (width, height, channels, row-major pixel bytes).

    Verifies the signature and every chunk CRC; raises ``ValueError``
    on truncation, corruption, or out-of-subset features — a decode
    task must fail loudly, never emit garbage pixels.
    """
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = ctype = None
    idat = bytearray()
    seen_end = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC on {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if comp or filt:
                raise ValueError("unsupported compression/filter method")
            if interlace:
                raise ValueError("interlaced (Adam7) PNG unsupported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    if not seen_end:
        raise ValueError("missing IEND")
    raw = zlib.decompress(bytes(idat))
    ch = CHANNELS[ctype]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"pixel payload size mismatch: {len(raw)} != "
            f"{(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        po = o - stride
        if f == 0:  # None
            out[o : o + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                left = out[o + x - ch] if x >= ch else 0
                out[o + x] = (line[x] + left) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                up = out[po + x] if y else 0
                out[o + x] = (line[x] + up) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = out[o + x - ch] if x >= ch else 0
                up = out[po + x] if y else 0
                out[o + x] = (line[x] + (left + up) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = out[o + x - ch] if x >= ch else 0
                up = out[po + x] if y else 0
                ul = out[po + x - ch] if (y and x >= ch) else 0
                out[o + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"invalid filter type {f}")
    return width, height, ch, bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filters=None,
) -> bytes:
    """Row-major pixel bytes → PNG bytes (the deterministic test/gate
    synthesizer). ``filters`` picks the filter type per row: a callable
    ``y -> 0..4``, a sequence, or None (all rows filter 0)."""
    if color_type not in CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    ch = CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")

    def ftype(y: int) -> int:
        if filters is None:
            return 0
        f = filters(y) if callable(filters) else filters[y]
        if not 0 <= f <= 4:
            raise ValueError(f"invalid filter type {f}")
        return f

    raw = bytearray()
    for y in range(height):
        f = ftype(y)
        line = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)
        raw.append(f)
        if f == 0:
            raw += line
            continue
        for x in range(stride):
            left = line[x - ch] if x >= ch else 0
            up = prev[x]
            if f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                ul = prev[x - ch] if x >= ch else 0
                pred = _paeth(left, up, ul)
            raw.append((line[x] - pred) & 0xFF)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
