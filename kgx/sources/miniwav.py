"""Stdlib-only WAV (RIFF PCM) audio codec — the live-bytes audio decode path.

Companion to kgx.sources.miniimage (BMP/PPM) and kgx.sources.minidoc
(PDF/DOCX): generator + parser pairs built entirely from the standard
library (``wave`` + ``struct``), so the multimodal AUDIO family gets a real
decode path instead of a fake-bytes stand-in.  16-bit signed PCM, mono or
stereo — the format every audio toolchain reads.

``ValueError`` on malformed input (bad RIFF framing, unsupported width),
matching the document and image codecs' corrupt-input contract.
"""

from __future__ import annotations

import io
import struct
import wave


def encode_wav(
    samples: list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """16-bit PCM WAV of ``samples`` (interleaved when ``channels == 2``;
    ``len(samples)`` must then be even).  Values must fit int16."""
    if channels not in (1, 2):
        raise ValueError(f"unsupported channel count {channels}")
    if channels == 2 and len(samples) % 2:
        raise ValueError("stereo sample list must interleave to whole frames")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of int16 range")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(blob: bytes) -> dict:
    """Parse a 16-bit PCM WAV → exact-integer audio features:

    ``{channels, sample_rate, n_frames, duration_ms, peak, mean_abs}``

    ``duration_ms`` is floor(frames * 1000 / rate); ``peak`` / ``mean_abs``
    are max and floor-mean of ``|sample|`` across all channels — integer
    arithmetic throughout so the DuckDB oracle reproduces values exactly.
    """
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("bad WAV magic (missing RIFF/WAVE framing)")
    try:
        with wave.open(io.BytesIO(blob)) as w:
            channels = w.getnchannels()
            rate = w.getframerate()
            width = w.getsampwidth()
            n_frames = w.getnframes()
            raw = w.readframes(n_frames)
    except (wave.Error, EOFError, struct.error) as e:
        # wave raises EOFError (not wave.Error) for files truncated
        # mid-header — normalize to the codecs' corrupt-input contract
        raise ValueError(f"corrupt WAV: {e}") from e
    if width != 2:
        raise ValueError(f"unsupported sample width {width} (16-bit PCM only)")
    n = len(raw) // 2
    if n != n_frames * channels:
        raise ValueError("truncated WAV data chunk")
    if n == 0:
        raise ValueError("empty WAV (no frames)")
    vals = struct.unpack(f"<{n}h", raw)
    abs_vals = [abs(v) for v in vals]
    return {
        "channels": channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // rate,
        "peak": max(abs_vals),
        "mean_abs": sum(abs_vals) // n,
    }
