"""Stdlib-only BMP and PPM image codecs — the live-bytes media decode path.

The multimodal decode stage (kgx.operators.media) was previously
fake-bytes-only: no image/audio libraries exist in this sandbox.  This
module removes that boundary for two uncompressed raster formats whose
specs need nothing beyond ``struct``:

* **BMP** (Windows BITMAPINFOHEADER, 24-bit BI_RGB): ``encode_bmp`` emits a
  spec-valid bottom-up 24bpp file (rows padded to 4-byte multiples, BGR
  byte order) readable by any image viewer; ``decode_bmp`` parses both
  bottom-up and top-down (negative height) files and returns the full
  pixel matrix.
* **PPM** (Netpbm P6 binary, maxval 255): ``encode_ppm``/``decode_ppm``
  handle the token-oriented header (whitespace + ``#`` comments) and the
  raw RGB payload.

Mirrors the kgx.sources.minidoc approach that de-stubbed the PDF/DOCX
ingest (reference services.py:35-48 has the analogous single-node role for
documents): generator + parser pairs, deterministic output, ``ValueError``
on malformed input so the decode stage surfaces corrupt files instead of
emitting garbage.

Pixels are ``(r, g, b)`` tuples, row-major, top-down in both codecs' public
API regardless of the on-disk row order.
"""

from __future__ import annotations

import struct

Pixels = list[list[tuple[int, int, int]]]  # [row][col] = (r, g, b)

_BMP_HEADER_FMT = "<2sIHHI"  # magic, file size, res1, res2, data offset
_BMP_INFO_FMT = "<IiiHHIIiiII"  # BITMAPINFOHEADER


def encode_bmp(pixels: Pixels) -> bytes:
    """24-bit BI_RGB bottom-up BMP of the top-down pixel matrix."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    if h == 0 or w == 0:
        raise ValueError("empty pixel matrix")
    row_stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - w * 3)
    body = bytearray()
    for row in reversed(pixels):  # bottom-up storage
        if len(row) != w:
            raise ValueError("ragged pixel matrix")
        for r, g, b in row:
            body += bytes((b, g, r))  # BGR on disk
        body += pad
    data_offset = 14 + 40
    header = struct.pack(
        _BMP_HEADER_FMT, b"BM", data_offset + len(body), 0, 0, data_offset
    )
    info = struct.pack(
        _BMP_INFO_FMT, 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def decode_bmp(blob: bytes) -> Pixels:
    """Parse a 24-bit uncompressed BMP → top-down pixel matrix.  Handles
    bottom-up (positive height) and top-down (negative height) files;
    raises ``ValueError`` on other bit depths / compressions / truncation."""
    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("bad BMP magic")
    _, _, _, _, data_offset = struct.unpack(_BMP_HEADER_FMT, blob[:14])
    (
        info_size, w, h_raw, planes, bpp, compression,
        _, _, _, _, _,
    ) = struct.unpack(_BMP_INFO_FMT, blob[14:54])
    if info_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={info_size})")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP encoding (bpp={bpp}, comp={compression})")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    row_stride = (w * 3 + 3) & ~3
    if data_offset + row_stride * h > len(blob):
        raise ValueError("truncated BMP pixel data")
    rows: Pixels = []
    for ri in range(h):
        off = data_offset + ri * row_stride
        row = []
        for ci in range(w):
            b, g, r = blob[off + 3 * ci : off + 3 * ci + 3]
            row.append((r, g, b))
        rows.append(row)
    return rows if top_down else rows[::-1]


def encode_ppm(pixels: Pixels) -> bytes:
    """Binary Netpbm P6 (maxval 255) of the top-down pixel matrix."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    if h == 0 or w == 0:
        raise ValueError("empty pixel matrix")
    body = bytearray()
    for row in pixels:
        if len(row) != w:
            raise ValueError("ragged pixel matrix")
        for px in row:
            body += bytes(px)
    return f"P6\n{w} {h}\n255\n".encode("ascii") + bytes(body)


def _ppm_tokens(blob: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer header tokens, skipping
    ``#`` comments (Netpbm header grammar); returns (tokens, next_offset)."""
    toks: list[int] = []
    i = start
    while len(toks) < n:
        if i >= len(blob):
            raise ValueError("truncated PPM header")
        c = blob[i : i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            while i < len(blob) and blob[i : i + 1] != b"\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < len(blob) and blob[j : j + 1].isdigit():
                j += 1
            toks.append(int(blob[i:j]))
            i = j
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    return toks, i


def decode_ppm(blob: bytes) -> Pixels:
    """Parse a binary P6 PPM → top-down pixel matrix."""
    if blob[:2] != b"P6":
        raise ValueError("bad PPM magic (want P6)")
    (w, h, maxval), i = _ppm_tokens(blob, 3, 2)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PPM dimensions {w}x{h}")
    i += 1  # exactly ONE whitespace byte separates header from raster
    if i + 3 * w * h > len(blob):
        raise ValueError("truncated PPM raster")
    rows: Pixels = []
    for ri in range(h):
        off = i + ri * 3 * w
        rows.append(
            [tuple(blob[off + 3 * ci : off + 3 * ci + 3]) for ci in range(w)]
        )
    return rows


def sniff_decode(blob: bytes) -> tuple[str, Pixels]:
    """Magic-sniffing dispatch: (format, pixels).  The decode stage uses
    this so a mixed-format binary column needs no per-row format column."""
    if blob[:2] == b"BM":
        return "bmp", decode_bmp(blob)
    if blob[:2] == b"P6":
        return "ppm", decode_ppm(blob)
    raise ValueError(f"unrecognized image magic {blob[:2]!r}")


def nearest_resize(pixels: Pixels, out_w: int, out_h: int) -> Pixels:
    """Nearest-neighbor resample to ``out_w`` × ``out_h`` — pure integer
    source indexing (``src = out_idx * in_dim DIV out_dim``), so the result
    is deterministic across platforms and a solid-fill input stays exactly
    solid (the property the resize oracle leans on)."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    if h == 0 or w == 0:
        raise ValueError("empty pixel matrix")
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"bad output dimensions {out_w}x{out_h}")
    return [
        [pixels[ri * h // out_h][ci * w // out_w] for ci in range(out_w)]
        for ri in range(out_h)
    ]


def channel_means(pixels: Pixels) -> tuple[int, int, int]:
    """Exact floor-divided per-channel means — integer arithmetic so the
    DuckDB oracle reproduces the values bit-for-bit."""
    n = sum(len(row) for row in pixels)
    sr = sum(px[0] for row in pixels for px in row)
    sg = sum(px[1] for row in pixels for px in row)
    sb = sum(px[2] for row in pixels for px in row)
    return sr // n, sg // n, sb // n
