"""Stdlib-only uncompressed AVI (RIFF) video codec — the live-bytes video
decode path.

Completes the live-media trio: kgx.sources.miniimage (BMP/PPM),
kgx.sources.miniwav (PCM WAV) — and now video via AVI, the one mainstream
video *container* whose uncompressed form ("DIB"/raw video stream, the
format every `ffmpeg -c:v rawvideo` and VfW toolchain reads) needs nothing
beyond ``struct``:

* ``encode_avi`` emits a spec-valid single-stream AVI: ``RIFF('AVI ')`` →
  ``LIST(hdrl)`` with the ``avih`` main header and a ``vids/DIB `` stream
  (``strh`` + BITMAPINFOHEADER ``strf``) → ``LIST(movi)`` with one
  ``00db`` chunk per frame (24-bit bottom-up BGR rows padded to 4-byte
  stride — the same DIB pixel layout miniimage's BMP uses) → an ``idx1``
  index so seek-capable players accept it.
* ``decode_avi`` walks the RIFF chunk tree back: validates framing, reads
  the frame rate from ``strh``'s rate/scale rational, requires 24-bit
  BI_RGB, and returns every frame as a top-down pixel matrix.

``ValueError`` on malformed input (bad framing, truncation, unsupported
bit depth/compression, header/movi frame-count disagreement) — the same
corrupt-input contract as the document, image, and audio codecs.

Pixels are ``(r, g, b)`` tuples, row-major, top-down in the public API
regardless of the on-disk bottom-up row order (matches miniimage).
"""

from __future__ import annotations

import struct

from kgx.sources.miniimage import Pixels

_AVIH_FMT = "<14I"  # dwMicroSecPerFrame..dwHeight + 4 reserved
_STRH_FMT = "<4s4sIHHIIIIIIII4h"
_BMPINFO_FMT = "<IiiHHIIiiII"  # BITMAPINFOHEADER (shared with BMP)


def _dib_body(frame: Pixels, w: int, h: int) -> bytes:
    """Bottom-up padded BGR pixel array of one top-down frame."""
    row_stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - w * 3)
    body = bytearray()
    for row in reversed(frame):
        if len(row) != w:
            raise ValueError("ragged pixel matrix")
        for r, g, b in row:
            body += bytes((b, g, r))
        body += pad
    return bytes(body)


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    """RIFF chunk: fourcc + size + data (+ pad byte when size is odd)."""
    return fourcc + struct.pack("<I", len(data)) + data + (
        b"\x00" if len(data) % 2 else b""
    )


def _list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def encode_avi(frames: list[Pixels], fps: int = 10) -> bytes:
    """Single-stream uncompressed 24-bit AVI of ``frames`` (all the same
    dimensions) at integer ``fps`` (scale=1, rate=fps)."""
    if not frames:
        raise ValueError("empty frame list")
    if fps <= 0:
        raise ValueError(f"bad fps {fps}")
    h = len(frames[0])
    w = len(frames[0][0]) if h else 0
    if h == 0 or w == 0:
        raise ValueError("empty pixel matrix")
    for f in frames:
        if len(f) != h or any(len(row) != w for row in f):
            raise ValueError("frames must share dimensions")
    row_stride = (w * 3 + 3) & ~3
    frame_size = row_stride * h

    avih = _chunk(
        b"avih",
        struct.pack(
            _AVIH_FMT,
            1_000_000 // fps,  # dwMicroSecPerFrame
            frame_size * fps,  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0x10,  # dwFlags: AVIF_HASINDEX
            len(frames),  # dwTotalFrames
            0,  # dwInitialFrames
            1,  # dwStreams
            frame_size,  # dwSuggestedBufferSize
            w,
            h,
            0, 0, 0, 0,  # dwReserved
        ),
    )
    strh = _chunk(
        b"strh",
        struct.pack(
            _STRH_FMT,
            b"vids", b"DIB ",
            0, 0, 0, 0,  # dwFlags, wPriority, wLanguage, dwInitialFrames
            1, fps,  # dwScale, dwRate → fps = rate/scale
            0, len(frames),  # dwStart, dwLength (frames)
            frame_size, 0xFFFFFFFF, 0,  # bufsize, quality(-1), samplesize
            0, 0, w, h,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(_BMPINFO_FMT, 40, w, h, 1, 24, 0, frame_size,
                    2835, 2835, 0, 0),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_payload = bytearray()
    index = bytearray()
    for frame in frames:
        # idx1 offsets are relative to the start of the movi list type word
        index += b"00db" + struct.pack(
            "<III", 0x10, 4 + len(movi_payload), frame_size
        )  # AVIIF_KEYFRAME
        movi_payload += _chunk(b"00db", _dib_body(frame, w, h))
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(b"idx1", bytes(index))

    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk(blob: bytes, start: int, end: int):
    """Yield (fourcc, data_start, data_size) for each chunk in [start, end);
    honors the RIFF odd-size pad byte."""
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError("truncated RIFF chunk header")
        fourcc = blob[i : i + 4]
        (size,) = struct.unpack("<I", blob[i + 4 : i + 8])
        if i + 8 + size > end:
            raise ValueError(f"chunk {fourcc!r} overruns its parent")
        yield fourcc, i + 8, size
        i += 8 + size + (size % 2)


def decode_avi(blob: bytes) -> dict:
    """Parse an uncompressed 24-bit single-video-stream AVI →
    ``{rate, scale, width, height, frames}`` with ``frames`` a list of
    top-down pixel matrices (fps = rate/scale; integer when scale == 1).
    ``ValueError`` on malformed, truncated, or unsupported input."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("bad AVI magic (missing RIFF/AVI framing)")
    (riff_size,) = struct.unpack("<I", blob[4:8])
    if 8 + riff_size > len(blob):
        raise ValueError("truncated RIFF payload")

    total_frames = width = height = None
    rate = scale = None
    bpp = compression = None
    frames: list[Pixels] = []

    for fourcc, ds, size in _walk(blob, 12, 8 + riff_size):
        if fourcc != b"LIST":
            continue
        list_type = blob[ds : ds + 4]
        if list_type == b"hdrl":
            for cc2, ds2, size2 in _walk(blob, ds + 4, ds + size):
                if cc2 == b"avih":
                    if size2 < 56:
                        raise ValueError("short avih header")
                    vals = struct.unpack(_AVIH_FMT, blob[ds2 : ds2 + 56])
                    total_frames, width, height = vals[4], vals[8], vals[9]
                elif cc2 == b"LIST" and blob[ds2 : ds2 + 4] == b"strl":
                    for cc3, ds3, size3 in _walk(blob, ds2 + 4, ds2 + size2):
                        if cc3 == b"strh":
                            if size3 < 56:
                                raise ValueError("short strh header")
                            sh = struct.unpack(_STRH_FMT, blob[ds3 : ds3 + 56])
                            if sh[0] != b"vids":
                                break  # non-video stream: skip this strl
                            scale, rate = sh[6], sh[7]
                        elif cc3 == b"strf" and size3 >= 40:
                            info = struct.unpack(
                                _BMPINFO_FMT, blob[ds3 : ds3 + 40]
                            )
                            bpp, compression = info[4], info[5]
        elif list_type == b"movi":
            for cc2, ds2, size2 in _walk(blob, ds + 4, ds + size):
                if cc2 in (b"00db", b"00dc"):
                    frames.append((ds2, size2))  # decode after headers known

    if width is None or total_frames is None:
        raise ValueError("missing avih main header")
    if rate is None or scale is None:
        raise ValueError("missing vids strh stream header")
    if scale == 0 or rate == 0:
        raise ValueError(f"bad frame rate {rate}/{scale}")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported AVI video encoding (bpp={bpp}, comp={compression})"
        )
    if width <= 0 or height <= 0:
        raise ValueError(f"bad AVI dimensions {width}x{height}")
    if len(frames) != total_frames:
        raise ValueError(
            f"avih declares {total_frames} frames but movi has {len(frames)}"
        )

    row_stride = (width * 3 + 3) & ~3
    decoded: list[Pixels] = []
    for ds2, size2 in frames:
        if size2 != row_stride * height:
            raise ValueError("frame chunk size disagrees with dimensions")
        rows: Pixels = []
        for ri in range(height):
            off = ds2 + ri * row_stride
            rows.append(
                [
                    (blob[off + 3 * ci + 2], blob[off + 3 * ci + 1],
                     blob[off + 3 * ci])
                    for ci in range(width)
                ]
            )
        decoded.append(rows[::-1])  # bottom-up on disk → top-down API
    return {
        "rate": rate,
        "scale": scale,
        "width": width,
        "height": height,
        "frames": decoded,
    }
