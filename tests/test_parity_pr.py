"""Explicit precision/recall vs the reference extractor's verified outputs.

BASELINE.json requires P/R >= 0.95 on label-resolved (subj, pred, obj) sets
vs the reference rule extractor (USE_OLLAMA=False).  The golden triple sets
below were produced by EXECUTING the actual reference code during the survey
(FIXTURES.md §3, entries marked [verified]); both engines are deterministic,
so the target is exact equality (P = R = 1.0).

The Spark pipeline (spans → rebuild → mapInPandas extraction) is measured
end-to-end, not just the pure-Python rule engine.
"""

import pandas as pd

from kgx.operators import extract, spans as spans_op

# (doc_id, text, verified golden triple set)
GOLDENS = [
    (
        "doc-sample",
        "John Doe is the CEO of Acme Corporation, headquartered in New York City. "
        "Jane Smith founded TechStart in San Francisco in 2020. "
        "In 2024, Acme Corporation acquired TechStart for $50 million. "
        "John Doe manages the Engineering Department at Acme. "
        "Sarah Johnson works as a Senior Engineer at Acme Corporation. "
        "TechStart developed an AI platform called SmartBot. "
        "SmartBot is used by companies worldwide. "
        "Jane Smith now serves as CTO of Acme Corporation. "
        "The Engineering Department is located in the New York office.",
        {
            ("John Doe", "ceo_of", "Acme Corporation"),
            ("Jane Smith", "member_of", "Acme Corporation"),
        },
    ),
    (
        "doc-test",
        "John Doe works at Acme Corporation in New York. "
        "Shubham also works at Acme Corporation in Patna.",
        set(),
    ),
    (
        "doc-camel",
        "Jane Smith founded Techstart in San Francisco in 2020.",
        {("Jane Smith", "founded", "Techstart")},
    ),
    (
        "doc-dup",
        "John Doe is the CEO of Acme Corporation. "
        "John Doe is the CEO of Acme Corporation.",
        {("John Doe", "ceo_of", "Acme Corporation")},
    ),
    (
        "doc-interleaved",
        "John Doe is the CEO of Acme Corporation. "
        "Acme Corporation is located in Berlin.",
        {
            ("John Doe", "ceo_of", "Acme Corporation"),
            ("Acme Corporation", "located_in", "Berlin"),
        },
    ),
    ("doc-empty", "", set()),
]


def test_precision_recall_vs_reference_goldens(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [d for d, _, _ in GOLDENS], "doc_text": [t for _, t, _ in GOLDENS]}
        )
    )
    got_rows = extract.triples_table(extract.extract_graphs(df)).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["doc_id"], set()).add((r["subj"], r["pred"], r["obj"]))

    tp = fp = fn = 0
    for doc_id, _, golden in GOLDENS:
        g = got.get(doc_id, set())
        tp += len(g & golden)
        fp += len(g - golden)
        fn += len(golden - g)

    precision = tp / (tp + fp) if (tp + fp) else 1.0
    recall = tp / (tp + fn) if (tp + fn) else 1.0
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # deterministic engines: demand exact match, not just the 0.95 floor
    assert precision == 1.0 and recall == 1.0
