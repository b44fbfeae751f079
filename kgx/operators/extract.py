"""Vectorized graph extraction — Arrow-batched ``mapInPandas`` UDTF.

One input row (doc_id, doc_text) → one output row carrying the full
per-document graph as nested arrays.  This keeps the Python boundary to a
single crossing per document batch (no per-row Python from the driver, per
BASELINE.json ``input_hint``), and the downstream explodes into flat
nodes/edges/triples tables run JVM-side.

Design notes for 100 TB scale:

- The UDF emits *arrays* rather than exploded rows so the Arrow return batch
  stays one-row-per-doc — explode happens in the JVM where it's free, and a
  single ``mapInPandas`` pass feeds all three output tables (nodes, edges,
  triples) without re-running Python.
- Patterns compile once per worker process at import of
  :mod:`kgx.operators.rules`.
- Per-doc work is O(len(text) * |patterns|); documents are independent, so
  throughput scales with input splits.  Skew from heavy-tail doc lengths is
  handled upstream by salted repartition (see kgx.plans.pipeline).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx.operators import rules

GRAPH_SCHEMA = (
    "doc_id string, "
    "nodes array<struct<node_id:string,label:string,node_type:string>>, "
    "edges array<struct<src:string,dst:string,relationship:string>>, "
    "triples array<struct<subj:string,pred:string,obj:string>>"
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids = pdf["doc_id"].tolist()
        nodes_col, edges_col, triples_col = [], [], []
        for text in pdf["doc_text"].tolist():
            nodes, edges, triples = rules.extract_document(text or "")
            nodes_col.append(
                [
                    {"node_id": nid, "label": lbl, "node_type": typ}
                    for nid, lbl, typ in nodes
                ]
            )
            edges_col.append(
                [{"src": s, "dst": d, "relationship": r} for s, d, r in edges]
            )
            triples_col.append(
                [{"subj": s, "pred": p, "obj": o} for s, p, o in triples]
            )
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "nodes": nodes_col,
                "edges": edges_col,
                "triples": triples_col,
            }
        )


def extract_graphs(docs_with_text: DataFrame) -> DataFrame:
    """(doc_id, doc_text, ...) → (doc_id, nodes, edges, triples)."""
    return docs_with_text.select("doc_id", "doc_text").mapInPandas(
        _extract_batches, schema=GRAPH_SCHEMA
    )


# ---- flat table views (JVM-side explodes; one UDF pass feeds all three) ----

def nodes_table(graphs: DataFrame) -> DataFrame:
    return graphs.select("doc_id", F.explode("nodes").alias("n")).select(
        "doc_id",
        F.col("n.node_id").alias("node_id"),
        F.col("n.label").alias("label"),
        F.col("n.node_type").alias("node_type"),
    )


def edges_table(graphs: DataFrame) -> DataFrame:
    return graphs.select("doc_id", F.explode("edges").alias("e")).select(
        "doc_id",
        F.col("e.src").alias("src"),
        F.col("e.dst").alias("dst"),
        F.col("e.relationship").alias("relationship"),
    )


def triples_table(graphs: DataFrame) -> DataFrame:
    return graphs.select("doc_id", F.explode("triples").alias("t")).select(
        "doc_id",
        F.col("t.subj").alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
    )
