"""Graph sanity validation (SURVEY §2.2 P7-P9).

The reference enforces result sanity procedurally: ≤1000 nodes / ≤2000 edges
per document (services.py:143-148), field length caps (node_id ≤ 50,
label ≤ 255, type ≤ 100, relationship ≤ 100; validators.py:237-252,
290-294), non-empty after strip, and duplicate rejection
(validators.py:193-213).  Here the same contract is one declarative
projection over the nested graph row — a filter stage the pipeline can
insert between extraction and materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_NODES = 1000
MAX_EDGES = 2000
MAX_LABEL = 255
MAX_NODE_ID = 50
MAX_TYPE = 100
MAX_REL = 100


def graph_checks(graphs: DataFrame) -> DataFrame:
    """(doc_id, nodes, edges, ...) → per-doc validation metrics + verdict."""
    return graphs.select(
        "doc_id",
        F.size("nodes").cast("int").alias("n_nodes"),
        F.size("edges").cast("int").alias("n_edges"),
        F.expr(
            "cast(coalesce(aggregate(nodes, 0, (a, n) -> greatest(a, length(n.label))), 0) as int)"
        ).alias("max_label_len"),
        F.expr(
            "size(nodes) = size(array_distinct(transform(nodes, n -> n.node_id)))"
        ).alias("unique_node_ids"),
        F.expr(
            "size(edges) = size(array_distinct(transform(edges, "
            "e -> concat(e.src, '|', e.dst, '|', e.relationship))))"
        ).alias("unique_edges"),
    ).withColumn(
        "is_valid",
        (F.col("n_nodes") <= MAX_NODES)
        & (F.col("n_edges") <= MAX_EDGES)
        & (F.col("max_label_len") <= MAX_LABEL)
        & F.col("unique_node_ids")
        & F.col("unique_edges"),
    )


def valid_graphs(graphs: DataFrame) -> DataFrame:
    """Filtered pass-through — the pipeline insertion point."""
    checks = graph_checks(graphs).where("is_valid").select("doc_id")
    return graphs.join(checks, "doc_id", "left_semi")
