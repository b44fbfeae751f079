"""Multimodal span plumbing — typed metadata + decode/feature stages.

Media spans are opaque references with typed metadata; the Spark-side
contract (schema, partitioning, Arrow batch shape) is real and tested.
Byte-level decode comes in two tiers:

* ``decode_media_bytes`` — LIVE decode of real image bytes for the two
  uncompressed raster formats the stdlib can carry (BMP and binary PPM,
  kgx.sources.miniimage — the same generator+parser de-stubbing approach
  minidoc took for PDF/DOCX).  ``synthesize_media_blobs`` materializes a
  deterministic binary column (the sandbox stand-in for an object-store
  fetch) so the full bytes-through-Arrow → parse → feature path runs and
  is oracle-checked end-to-end.
* ``decode_media(fake=True)`` — deterministic md5-derived features for
  formats whose codecs are absent offline (png/jpg/mp4/wav); the
  ``fake=False`` signature raises ``NotImplementedError`` for those.

At scale the decode stage is exactly this ``mapInPandas`` shape: binary
columns stream through Arrow batches, the Python worker calls the codec, and
bounded ``maxRecordsPerBatch`` keeps worker memory flat.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx.functions import hashing

#: deterministic fake metadata derivation (oracle-reproducible): 60-bit md5
#: of the media_ref drives every synthesized property.
_H = hashing.spark_md5_60("media_ref")

MEDIA_META_EXPRS = {
    "media_type": (
        "CASE WHEN media_ref LIKE '%.png' OR media_ref LIKE '%.jpg' THEN 'image' "
        "WHEN media_ref LIKE '%.mp4' THEN 'video' "
        "WHEN media_ref LIKE '%.wav' OR media_ref LIKE '%.mp3' THEN 'audio' "
        "ELSE 'binary' END"
    ),
    "byte_size": f"cast({_H} % 10000000 as bigint)",
    "width": f"cast(({_H} % 1920) + 1 as int)",
    "height": f"cast(({_H} % 1080) + 1 as int)",
}


def media_inventory(spans_flat: DataFrame) -> DataFrame:
    """(doc_id, span_pos, kind, media_ref, ...) → typed media metadata table.
    Pure projection over media spans; pushdown-friendly (filter on kind)."""
    out = spans_flat.where(F.col("kind") == "media").select(
        "doc_id",
        F.col("span_pos").cast("int").alias("span_pos"),
        "media_ref",
        *[F.expr(e).alias(name) for name, e in MEDIA_META_EXPRS.items()],
    )
    return out


DECODED_SCHEMA = (
    "doc_id string, media_ref string, frames int, feature array<double>"
)


def decode_media(inventory: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extraction stage.

    ``fake=True`` produces a deterministic 4-dim feature from the media_ref
    hash (tests + demos).  ``fake=False`` is the production signature and
    raises ``NotImplementedError`` in this sandbox (no codecs installed) —
    the surrounding plumbing (schema, batching, partitioning) is the real
    deliverable here.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "png/jpg/mp4/wav codecs unavailable in this environment; "
                    "use fake=True, or decode_media_bytes for the LIVE "
                    "stdlib BMP/PPM path over a binary column"
                )
            feats, frames = [], []
            for ref in pdf["media_ref"].tolist():
                h = hashlib.md5(ref.encode()).digest()
                feats.append([b / 255.0 for b in h[:4]])
                frames.append(1 + h[4] % 8)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "frames": frames,
                    "feature": feats,
                }
            )

    return inventory.select("doc_id", "media_ref").mapInPandas(
        _decode, schema=DECODED_SCHEMA
    )


BLOB_SCHEMA = "doc_id string, media_ref string, content binary"

DECODED_REAL_SCHEMA = (
    "doc_id string, media_ref string, format string, width int, height int, "
    "mean_r int, mean_g int, mean_b int"
)


def _md5_60(s: str) -> int:
    """Python twin of kgx.functions.hashing.spark_md5_60 / duckdb_md5_60."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def synthesize_media_blobs(inventory: DataFrame) -> DataFrame:
    """Deterministic real image bytes per media span — the sandbox
    stand-in for fetching the object-store blob a media_ref points at.

    Every property derives from the span's md5-60 hash (the shared
    cross-engine derivation, kgx.functions.hashing), so the DuckDB oracle
    recomputes what the decoder must read back: width ``1 + h % 31``,
    height ``1 + (h DIV 31) % 23``, a solid fill color ``(h % 256,
    h DIV 256 % 256, h DIV 65536 % 256)``, and the container format by hash
    parity (even → BMP, odd → PPM).  Solid fill keeps the oracle exact —
    per-channel mean == the fill value — while the decoder itself is
    format-general (gradient images are covered by unit tests)."""
    from kgx.sources import miniimage

    def _blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for ref in pdf["media_ref"].tolist():
                h = _md5_60(ref)
                w = 1 + h % 31
                ht = 1 + (h // 31) % 23
                color = (h % 256, (h // 256) % 256, (h // 65536) % 256)
                pixels = [[color] * w for _ in range(ht)]
                enc = miniimage.encode_bmp if h % 2 == 0 else miniimage.encode_ppm
                blobs.append(enc(pixels))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(str),
                    "media_ref": pdf["media_ref"],
                    "content": blobs,
                }
            )

    return inventory.select("doc_id", "media_ref").mapInPandas(
        _blobs, schema=BLOB_SCHEMA
    )


def decode_media_bytes(blobs: DataFrame) -> DataFrame:
    """LIVE image decode over a binary column: magic-sniffing stdlib
    BMP/PPM parse (kgx.sources.miniimage.sniff_decode) → dimensions and
    exact integer per-channel means.  This is the production decode
    signature — real bytes in, parsed features out, one Arrow crossing —
    with no fake path; unsupported magic raises so corrupt blobs surface
    instead of emitting garbage (same contract as the document codecs)."""
    from kgx.sources import miniimage

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, mr, mg, mb = [], [], [], [], [], []
            for blob in pdf["content"].tolist():
                fmt, pixels = miniimage.sniff_decode(bytes(blob))
                r, g, b = miniimage.channel_means(pixels)
                fmts.append(fmt)
                ws.append(len(pixels[0]))
                hs.append(len(pixels))
                mr.append(r)
                mg.append(g)
                mb.append(b)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "format": fmts,
                    "width": ws,
                    "height": hs,
                    "mean_r": mr,
                    "mean_g": mg,
                    "mean_b": mb,
                }
            )

    return blobs.mapInPandas(_decode, schema=DECODED_REAL_SCHEMA)


AUDIO_DECODED_SCHEMA = (
    "doc_id string, media_ref string, channels int, sample_rate int, "
    "n_frames int, duration_ms bigint, peak int, mean_abs int"
)


def synthesize_audio_blobs(inventory: DataFrame) -> DataFrame:
    """Deterministic real WAV bytes per AUDIO span (media_type == 'audio')
    — the audio twin of :func:`synthesize_media_blobs`.  Every property
    derives from the span's md5-60 hash: mono/stereo by parity, frame
    count ``160 + h % 800`` at 8 kHz, and a ±A square wave with amplitude
    ``1000 + (h DIV 7) % 20000`` — so the decoded peak and mean(|sample|)
    both equal A exactly and the DuckDB oracle recomputes every feature
    without touching bytes.  Arbitrary waveforms are covered by unit
    tests; the square wave is the oracle-exact gate shape."""
    from kgx.sources import miniwav

    def _blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for ref in pdf["media_ref"].tolist():
                h = _md5_60(ref)
                channels = 1 + h % 2
                n_frames = 160 + h % 800
                amp = 1000 + (h // 7) % 20000
                frames = [amp if i % 2 == 0 else -amp for i in range(n_frames)]
                samples = (
                    frames if channels == 1
                    else [v for v in frames for _ in range(2)]
                )
                blobs.append(miniwav.encode_wav(samples, 8000, channels))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(str),
                    "media_ref": pdf["media_ref"],
                    "content": blobs,
                }
            )

    return (
        inventory.where(F.col("media_type") == "audio")
        .select("doc_id", "media_ref")
        .mapInPandas(_blobs, schema=BLOB_SCHEMA)
    )


def decode_audio_bytes(blobs: DataFrame) -> DataFrame:
    """LIVE audio decode over a binary column: stdlib RIFF/PCM parse
    (kgx.sources.miniwav.decode_wav) → exact-integer features (channels,
    rate, frames, duration, peak, mean |sample|).  Real bytes in, parsed
    features out, one Arrow crossing, no fake path — corrupt blobs raise."""
    from kgx.sources import miniwav

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                k: [] for k in (
                    "channels", "sample_rate", "n_frames",
                    "duration_ms", "peak", "mean_abs",
                )
            }
            for blob in pdf["content"].tolist():
                feats = miniwav.decode_wav(bytes(blob))
                for k in cols:
                    cols[k].append(feats[k])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    **cols,
                }
            )

    return blobs.mapInPandas(_decode, schema=AUDIO_DECODED_SCHEMA)


VIDEO_DECODED_SCHEMA = (
    "doc_id string, media_ref string, format string, width int, height int, "
    "fps int, n_frames int, duration_ms bigint, mean_r int, mean_g int, "
    "mean_b int"
)

FRAME_REAL_SCHEMA = (
    "doc_id string, media_ref string, frame_idx int, ts_ms bigint, "
    "mean_r int, mean_g int, mean_b int"
)

#: fps choices for synthesized videos — every value divides 1000, so
#: duration_ms and per-frame ts_ms are exact integers on both engines
VIDEO_FPS_CHOICES = (4, 5, 8, 10, 20, 25)


def synthesize_video_blobs(inventory: DataFrame) -> DataFrame:
    """Deterministic real AVI bytes per VIDEO span (media_type == 'video')
    — the video member of the :func:`synthesize_media_blobs` family.
    Every property derives from the span's md5-60 hash ``h``: width
    ``1 + h % 15``, height ``1 + (h DIV 31) % 11``, fps
    ``VIDEO_FPS_CHOICES[h % 6]``, ``2 + (h DIV 7) % 9`` frames, and frame
    ``i`` is a solid fill ``((h + 37*i) % 256, (h DIV 256 + 53*i) % 256,
    (h DIV 65536 + 71*i) % 256)`` — so per-frame channel means equal the
    fill exactly and the whole-video floor-means reduce to
    ``sum(color_i) DIV n`` (the per-pixel count cancels), all recomputable
    by the DuckDB oracle without touching bytes.  Arbitrary frames are
    covered by the codec's unit/property tests; solid fills are the
    oracle-exact gate shape."""
    from kgx.sources import miniavi

    def _blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for ref in pdf["media_ref"].tolist():
                h = _md5_60(ref)
                w = 1 + h % 15
                ht = 1 + (h // 31) % 11
                fps = VIDEO_FPS_CHOICES[h % 6]
                n = 2 + (h // 7) % 9
                frames = []
                for i in range(n):
                    color = (
                        (h + 37 * i) % 256,
                        (h // 256 + 53 * i) % 256,
                        (h // 65536 + 71 * i) % 256,
                    )
                    frames.append([[color] * w for _ in range(ht)])
                blobs.append(miniavi.encode_avi(frames, fps))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(str),
                    "media_ref": pdf["media_ref"],
                    "content": blobs,
                }
            )

    return (
        inventory.where(F.col("media_type") == "video")
        .select("doc_id", "media_ref")
        .mapInPandas(_blobs, schema=BLOB_SCHEMA)
    )


def decode_video_bytes(blobs: DataFrame) -> DataFrame:
    """LIVE video decode over a binary column: stdlib RIFF/AVI parse
    (kgx.sources.miniavi.decode_avi) → container features plus exact
    whole-video integer channel means (floor of the sum over every pixel
    of every frame).  ``fps`` is rate DIV scale and ``duration_ms`` is
    ``n * 1000 * scale DIV rate`` — exact for integer-fps files (all ours)
    and still well-defined for NTSC-style rationals.  Real bytes in,
    parsed features out, one Arrow crossing, no fake path — corrupt blobs
    raise (same contract as the document/image/audio codecs)."""
    from kgx.sources import miniavi

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                k: [] for k in (
                    "format", "width", "height", "fps", "n_frames",
                    "duration_ms", "mean_r", "mean_g", "mean_b",
                )
            }
            for blob in pdf["content"].tolist():
                v = miniavi.decode_avi(bytes(blob))
                n = len(v["frames"])
                npx = n * v["width"] * v["height"]
                sr = sg = sb = 0
                for frame in v["frames"]:
                    for row in frame:
                        for r, g, b in row:
                            sr += r
                            sg += g
                            sb += b
                cols["format"].append("avi")
                cols["width"].append(v["width"])
                cols["height"].append(v["height"])
                cols["fps"].append(v["rate"] // v["scale"])
                cols["n_frames"].append(n)
                cols["duration_ms"].append(n * 1000 * v["scale"] // v["rate"])
                cols["mean_r"].append(sr // npx)
                cols["mean_g"].append(sg // npx)
                cols["mean_b"].append(sb // npx)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    **cols,
                }
            )

    return blobs.mapInPandas(_decode, schema=VIDEO_DECODED_SCHEMA)


def video_frame_means(blobs: DataFrame) -> DataFrame:
    """LIVE 1→N frame explode over real video bytes: each AVI row yields
    one output row per frame with its timestamp and exact per-frame
    integer channel means — the real-codec counterpart of
    :func:`frame_sample`'s fake path, and the same worker-memory shape a
    production sampler has (frames stream out through Arrow batches).
    ``ts_ms = frame_idx * 1000 * scale DIV rate`` in exact integer
    arithmetic."""
    from kgx.sources import miniavi
    from kgx.sources.miniimage import channel_means

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in (
                    "doc_id", "media_ref", "frame_idx", "ts_ms",
                    "mean_r", "mean_g", "mean_b",
                )
            }
            for doc, ref, blob in zip(
                pdf["doc_id"].tolist(),
                pdf["media_ref"].tolist(),
                pdf["content"].tolist(),
            ):
                v = miniavi.decode_avi(bytes(blob))
                for i, frame in enumerate(v["frames"]):
                    r, g, b = channel_means(frame)
                    out["doc_id"].append(doc)
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * 1000 * v["scale"] // v["rate"])
                    out["mean_r"].append(r)
                    out["mean_g"].append(g)
                    out["mean_b"].append(b)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_explode, schema=FRAME_REAL_SCHEMA)


FRAME_SCHEMA = (
    "doc_id string, media_ref string, frame_idx int, ts_ms bigint, frame binary"
)


def frame_sample(
    inventory: DataFrame, fps: int = 4, fake: bool = False
) -> DataFrame:
    """Video spans → sampled frames, the 1→N Arrow explode stage.

    Each video row yields its sampled frames as separate output rows —
    exactly the shape a real decoder uses (ffmpeg seek per timestamp inside
    the Python worker, rows stream out through Arrow batches, worker memory
    stays flat per ``maxRecordsPerBatch``).  ``fake=True`` derives the frame
    count with the same md5-byte-5 formula as ``decode_media``'s ``frames``
    column (the two stages agree row-for-row) and frame bytes as md5 of
    ``ref#idx`` — deterministic, so the DuckDB oracle reproduces every row;
    ``fake=False`` is the production signature and raises here (no codecs in
    this sandbox).  ``ts_ms`` = frame_idx * 1000 / fps in exact integer
    arithmetic (fps must divide 1000).
    """
    assert 1000 % fps == 0, "fps must divide 1000 for exact integer ts_ms"
    step = 1000 // fps

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs unavailable in this environment; "
                    "use fake=True or plug a real frame sampler here"
                )
            out = {k: [] for k in
                   ("doc_id", "media_ref", "frame_idx", "ts_ms", "frame")}
            for doc, ref in zip(pdf["doc_id"].tolist(),
                                pdf["media_ref"].tolist()):
                n = 1 + hashlib.md5(ref.encode()).digest()[4] % 8
                for i in range(n):
                    out["doc_id"].append(doc)
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * step)
                    out["frame"].append(
                        hashlib.md5(f"{ref}#{i}".encode()).digest()
                    )
            yield pd.DataFrame(out)

    return (
        inventory.where(F.col("media_type") == "video")
        .select("doc_id", "media_ref")
        .mapInPandas(_sample, schema=FRAME_SCHEMA)
    )


RESIZED_SCHEMA = (
    "doc_id string, media_ref string, width int, height int, "
    "out_width int, out_height int, thumb binary"
)

RESIZED_REAL_SCHEMA = (
    "doc_id string, media_ref string, format string, width int, height int, "
    "out_width int, out_height int, mean_r int, mean_g int, mean_b int"
)


def _aspect_fit(w: int, h: int, max_w: int, max_h: int) -> tuple[int, int]:
    """Aspect-fit target dims, never upscaled — exact integer arithmetic
    (floor-divide, min 1 px) shared by the fake and real resize paths so
    their dimension contracts can't drift."""
    if w <= max_w and h <= max_h:
        return w, h
    if w * max_h >= h * max_w:
        return max_w, max(1, (h * max_w) // w)
    return max(1, (w * max_h) // h), max_h


def resize_media_real(
    blobs: DataFrame, max_w: int = 8, max_h: int = 8
) -> DataFrame:
    """LIVE thumbnailing over a binary image column: stdlib decode →
    nearest-neighbor aspect-fit resample → re-encode in the SAME container
    → decode the thumbnail back and report its dims + exact integer channel
    means.  The full encode→resize→re-encode→re-decode loop runs on real
    bytes (kgx.sources.miniimage), so a malformed thumbnail container would
    fail loudly rather than ship; solid-fill inputs keep their fill exactly
    (nearest-neighbor takes existing pixels), which is what makes the
    DuckDB oracle exact on the gate corpus."""
    from kgx.sources import miniimage

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                k: [] for k in (
                    "format", "width", "height", "out_width", "out_height",
                    "mean_r", "mean_g", "mean_b",
                )
            }
            for blob in pdf["content"].tolist():
                fmt, pixels = miniimage.sniff_decode(bytes(blob))
                h = len(pixels)
                w = len(pixels[0])
                ow, oh = _aspect_fit(w, h, max_w, max_h)
                enc = (
                    miniimage.encode_bmp if fmt == "bmp"
                    else miniimage.encode_ppm
                )
                _, thumb = miniimage.sniff_decode(
                    enc(miniimage.nearest_resize(pixels, ow, oh))
                )
                r, g, b = miniimage.channel_means(thumb)
                cols["format"].append(fmt)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["out_width"].append(len(thumb[0]))
                cols["out_height"].append(len(thumb))
                cols["mean_r"].append(r)
                cols["mean_g"].append(g)
                cols["mean_b"].append(b)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    **cols,
                }
            )

    return blobs.mapInPandas(_resize, schema=RESIZED_REAL_SCHEMA)


def resize_media(
    inventory: DataFrame, max_w: int = 64, max_h: int = 64, fake: bool = False
) -> DataFrame:
    """Image spans → aspect-fit thumbnails (never upscaled).

    Target dims use exact integer arithmetic (floor-divide, min 1 px) so the
    DuckDB oracle reproduces them bit-for-bit: wide images clamp to
    ``max_w``, tall ones to ``max_h``.  ``fake=True`` synthesizes thumb bytes
    as md5 of ``ref|WxH``; ``fake=False`` is the production signature
    (raises here — no image codecs in this sandbox, the Arrow plumbing is
    the deliverable)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; "
                    "use fake=True or plug a real resizer here"
                )
            ows, ohs, thumbs = [], [], []
            for ref, w, h in zip(pdf["media_ref"].tolist(),
                                 pdf["width"].tolist(),
                                 pdf["height"].tolist()):
                ow, oh = _aspect_fit(int(w), int(h), max_w, max_h)
                ows.append(ow)
                ohs.append(oh)
                thumbs.append(
                    hashlib.md5(f"{ref}|{ow}x{oh}".encode()).digest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": ows,
                    "out_height": ohs,
                    "thumb": thumbs,
                }
            )

    return (
        inventory.where(F.col("media_type") == "image")
        .select("doc_id", "media_ref", "width", "height")
        .mapInPandas(_resize, schema=RESIZED_SCHEMA)
    )


def media_caption_pairs(spans_flat: DataFrame) -> DataFrame:
    """Caption mining over the interleaved span sequence (MMC4 / OBELICS
    style): for every media span, the nearest non-empty TEXT spans on
    either side in document order, plus the prefer-previous ``caption`` —
    the (image, caption) pair extraction an interleaved multimodal corpus
    feeds to image-text training.

    Input: the flat span table (kgx.operators.spans.explode_spans —
    doc_id, span_pos, kind, text, media_ref).  One shuffle: the per-doc
    window partitioned by doc_id, ordered by the EXPLICIT span_pos (the
    north-rule span-order invariant, never implicit row order).

    Output: (doc_id, media_ref, span_pos, prev_text, next_text, caption).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("span_pos")
    text_col = F.when(
        (F.col("kind") == "text") & (F.length("text") > 0), F.col("text")
    )
    prev = F.last(text_col, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = F.first(text_col, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        spans_flat.withColumn("prev_text", prev)
        .withColumn("next_text", nxt)
        .where(F.col("kind") == "media")
        .select(
            "doc_id",
            "media_ref",
            F.col("span_pos").cast("int").alias("span_pos"),
            "prev_text",
            "next_text",
            F.coalesce("prev_text", "next_text").alias("caption"),
        )
    )
