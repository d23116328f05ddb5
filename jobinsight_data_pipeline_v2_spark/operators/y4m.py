"""Pure-stdlib Y4M (YUV4MPEG2) video demuxer: the real VIDEO demux for
the multimodal path — completing the media triple (PNG images r7, WAV
audio r7, Y4M video r7).

Y4M is the uncompressed video interchange container (ffmpeg's
``-f yuv4mpeg``): a text stream header ``YUV4MPEG2 W<w> H<h> F<n>:<d>
[...]\\n`` followed by ``FRAME[...]\\n`` + raw YUV planes per frame.
No entropy coding — fully parseable with byte arithmetic, which makes
it the honest stdlib-only video format the way baseline PNG and PCM
WAV are for images and audio. Compressed codecs (H.264/VP9 in
MP4/WebM) still need a native library — out of subset, fail loudly.

Supported colorspaces: C420 (+ variants ``C420jpeg``/``C420paldv``,
same plane geometry), C422, C444, Cmono. Plane sizes per frame:

    C420: Y w·h + U,V (w/2)·(h/2)      C422: Y w·h + U,V (w/2)·h
    C444: Y,U,V w·h each               Cmono: Y w·h

``demux_y4m`` feeds ``operators.multimodal.sample_frames`` via
:func:`y4m_frame_splitter` (real frames instead of the byte-slice
stand-in); ``encode_y4m`` is the deterministic synthesizer for tests
and the ``y4m_frame_stats`` gate.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"


def _plane_bytes(w: int, h: int, cs: str) -> int:
    if cs.startswith("420"):
        if w % 2 or h % 2:
            raise ValueError("C420 requires even dimensions")
        return w * h + 2 * ((w // 2) * (h // 2))
    if cs == "422":
        if w % 2:
            raise ValueError("C422 requires even width")
        return w * h + 2 * ((w // 2) * h)
    if cs == "444":
        return 3 * w * h
    if cs == "mono":
        return w * h
    raise ValueError(f"unsupported colorspace C{cs}")


def demux_y4m(
    payload: bytes,
) -> tuple[int, int, tuple[int, int], str, list[bytes]]:
    """Y4M bytes → (width, height, (fps_num, fps_den), colorspace,
    [frame bytes]) — each frame is its raw concatenated Y[+U+V]
    planes. Raises ``ValueError`` on truncation or out-of-subset
    parameters."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    fps = (25, 1)
    cs = "420"
    for tok in payload[len(_MAGIC) + 1 : nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            n, d = val.split(":")
            fps = (int(n), int(d))
            if fps[1] == 0:
                raise ValueError("zero fps denominator")
        elif tag == "C":
            cs = val
        # I (interlacing), A (aspect), X (extensions): pass through
    if not width or not height:
        raise ValueError("missing W/H in stream header")
    size = _plane_bytes(width, height, cs)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        frame = payload[fnl + 1 : fnl + 1 + size]
        if len(frame) != size:
            raise ValueError(
                f"truncated frame {len(frames)}: {len(frame)} of "
                f"{size} bytes"
            )
        frames.append(frame)
        pos = fnl + 1 + size
    return width, height, fps, cs, frames


def encode_y4m(
    width: int,
    height: int,
    frames: list[bytes],
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "420",
) -> bytes:
    """Frame plane buffers → Y4M bytes (the deterministic synthesizer).
    Every frame must be exactly the colorspace's plane size."""
    size = _plane_bytes(width, height, colorspace)
    for i, f in enumerate(frames):
        if len(f) != size:
            raise ValueError(
                f"frame {i} is {len(f)} bytes, expected {size}"
            )
    head = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} "
        f"Ip A1:1 C{colorspace}\n"
    ).encode("ascii")
    return head + b"".join(b"FRAME\n" + f for f in frames)


def y4m_frame_splitter(payload: bytes, _frame_bytes: int) -> list[bytes]:
    """``split_fn`` adapter for ``multimodal.sample_frames``: REAL
    container demux in place of the fixed-size byte-slice stand-in
    (the ``_frame_bytes`` knob is the stand-in's parameter — a real
    container defines its own frame size)."""
    return demux_y4m(payload)[4]


def luma_sum(frame: bytes, width: int, height: int) -> int:
    """Exact integer sum of the Y (luma) plane — the first w·h bytes
    of any supported colorspace's frame buffer."""
    return sum(frame[: width * height])
