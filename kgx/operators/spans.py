"""Span-order-preserving operators (north-rule per-row invariant).

The per-row invariant: after any pipeline round-trip, each document's span
sequence (kind, text, media_ref, order) must equal the input exactly.  Spark
shuffles do not preserve array-build order from ``collect_list``, so every
reassembly here carries the explicit ``offset`` and sorts on it
(``sort_array`` over ``struct(offset, ...)``) — never relies on implicit
ordering (SURVEY.md §2.7 W5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Rebuild extraction text from a spans array — pure projection, no shuffle.
#: Matches the reference's "\n"-joined-paragraph semantics via space joining
#: of offset-ordered text spans (reference services.py:44-53; FIXTURES.md §1).
DOC_TEXT_EXPR = (
    "concat_ws(' ', transform(filter(array_sort(spans, (a, b) -> a.offset - b.offset),"
    " s -> s.kind = 'text'), s -> s.text))"
)


def with_doc_text(docs: DataFrame, out_col: str = "doc_text") -> DataFrame:
    """Add the extraction text column. Spans arrive per-row, so this is a
    narrow transformation — the canonical fast path for the pipeline."""
    return docs.withColumn(out_col, F.expr(DOC_TEXT_EXPR))


def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) → flat (doc_id, span_pos, kind, text, media_ref)."""
    return docs.select(
        "doc_id",
        F.explode("spans").alias("s"),
    ).select(
        "doc_id",
        F.col("s.offset").alias("span_pos"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def reassemble_spans(flat: DataFrame) -> DataFrame:
    """Inverse of :func:`explode_spans`; survives arbitrary shuffling because
    the collected structs are explicitly sorted by carried position."""
    return (
        flat.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("span_pos").cast("int").alias("offset"),
                        "kind",
                        "text",
                        "media_ref",
                    )
                )
            ).alias("sorted")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(sorted, s -> named_struct('kind', s.kind, 'text', s.text,"
                " 'media_ref', s.media_ref, 'offset', s.offset))"
            ).alias("spans"),
        )
    )
