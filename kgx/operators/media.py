"""Multimodal span plumbing — typed metadata + decode/feature stubs.

Media spans are opaque references with typed metadata; the Spark-side
contract (schema, partitioning, Arrow batch shape) is real and tested, while
byte-level decode is stubbed: the sandbox has no image/audio libraries, so
``decode_media`` raises ``NotImplementedError`` unless the deterministic
fake decoder is requested (used by tests and the metadata oracle).

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
                    "media codecs unavailable in this environment; "
                    "use fake=True or plug a real decoder here"
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
                w, h = int(w), int(h)
                if w <= max_w and h <= max_h:
                    ow, oh = w, h
                elif w * max_h >= h * max_w:
                    ow, oh = max_w, max(1, (h * max_w) // w)
                else:
                    ow, oh = max(1, (w * max_h) // h), max_h
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
