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
