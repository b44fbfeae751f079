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

# Reference seed_data.py narratives (seed_data.py:42-49, 113-122, 181-186),
# verbatim including their indentation/newlines.  All three yield ZERO triples
# from the reference extractor ([verified] by executing _extract_with_rules),
# so the discriminating golden is the exact ordered NODE list — including the
# quirks: multi-line mention capture ("Comprehensive Review\n…Dr"), all-caps
# tokens (MIT/NIH/CEO) never matched, CamelCase (TechStart/DataCorp/AcmeAI)
# never matched, 15-mention cap on doc-health/doc-csv.
SEED_DOC_ACME = """Acme Corporation is a leading technology company founded in 2010 by John Smith and Jane Doe.
            The company is headquartered in San Francisco, California. John Smith serves as the CEO while Jane Doe is the CTO.
            Acme Corporation specializes in artificial intelligence and machine learning solutions.
            The company has developed several innovative products including the AcmeAI platform and the SmartBot assistant.
            In 2024, Acme Corporation acquired TechStart, a smaller AI startup founded by Alice Johnson in 2018.
            The acquisition was completed for $50 million. Alice Johnson now serves as the Head of Innovation at Acme Corporation.
            The company employs over 500 people across offices in San Francisco, New York, and London.
            Acme Corporation's main competitors include DataCorp and AI Solutions Inc."""

SEED_DOC_HEALTH = """Machine Learning in Healthcare: A Comprehensive Review

            Dr. Sarah Wilson from Stanford University and Dr. Michael Chen from MIT have published a groundbreaking research paper on machine learning applications in healthcare.
            The study was conducted in collaboration with the National Institute of Health (NIH) and the World Health Organization (WHO).
            The research focuses on three main areas: diagnostic imaging, drug discovery, and patient monitoring.
            The team developed a new algorithm called HealthAI that can predict disease progression with 95% accuracy.
            The algorithm was trained on a dataset of over 1 million patient records from hospitals across the United States.
            The research was funded by the National Science Foundation (NSF) and the Bill & Melinda Gates Foundation.
            The paper was published in the Journal of Medical AI in March 2024.
            Future work will focus on implementing the algorithm in clinical settings and expanding the dataset to include international patient data."""

SEED_DOC_CSV = """Company,Revenue,Profit,Employees,CEO,Headquarters
            TechCorp,500000000,75000000,2500,David Kim,Seattle
            DataFlow Inc,300000000,45000000,1200,Lisa Wang,Boston
            CloudTech Solutions,800000000,120000000,4000,Robert Johnson,Austin
            AI Innovations,150000000,20000000,800,Emily Davis,San Francisco
            Quantum Systems,900000000,135000000,3500,James Wilson,New York"""

# (doc_id, text, [verified] ordered (node_id, label, node_type) golden)
SEED_GOLDENS = [
    (
        "doc-acme",
        SEED_DOC_ACME,
        [
            ("n1", "Acme Corporation", "Organization"),
            ("n2", "John Smith", "Person"),
            ("n3", "Jane Doe", "Person"),
            ("n4", "San Francisco", "Location"),
            ("n5", "California", "Entity"),
            ("n6", "Alice Johnson", "Person"),
            ("n7", "Head", "Entity"),
            ("n8", "Innovation", "Entity"),
            ("n9", "New York", "Location"),
            ("n10", "London", "Location"),
            ("n11", "Solutions Inc", "Organization"),
        ],
    ),
    (
        "doc-health",
        SEED_DOC_HEALTH,
        [
            ("n1", "Machine Learning", "Person"),
            ("n2", "Healthcare", "Entity"),
            ("n3", "Comprehensive Review\n\n            Dr", "Entity"),
            ("n4", "Sarah Wilson", "Person"),
            ("n5", "Stanford University", "Organization"),
            ("n6", "Dr", "Entity"),
            ("n7", "Michael Chen", "Person"),
            ("n8", "National Institute", "Organization"),
            ("n9", "Health", "Entity"),
            ("n10", "World Health Organization", "Entity"),
            ("n11", "United States", "Location"),
            ("n12", "National Science Foundation", "Entity"),
            ("n13", "Bill", "Entity"),
            ("n14", "Melinda Gates Foundation", "Entity"),
            ("n15", "Journal", "Entity"),
        ],
    ),
    (
        "doc-csv",
        SEED_DOC_CSV,
        [
            ("n1", "Company", "Organization"),
            ("n2", "Revenue", "Entity"),
            ("n3", "Profit", "Entity"),
            ("n4", "Employees", "Entity"),
            ("n5", "Headquarters", "Entity"),
            ("n6", "David Kim", "Person"),
            ("n7", "Seattle", "Entity"),
            ("n8", "Inc", "Organization"),
            ("n9", "Lisa Wang", "Person"),
            ("n10", "Boston", "Entity"),
            ("n11", "Solutions", "Entity"),
            ("n12", "Robert Johnson", "Person"),
            ("n13", "Austin", "Entity"),
            ("n14", "Innovations", "Entity"),
            ("n15", "Emily Davis", "Person"),
        ],
    ),
]


def test_seed_narrative_node_parity(spark):
    """The three reference seed_data.py narratives, end-to-end through the
    Spark extraction — exact ordered node-list equality (all three produce 0
    triples in the reference, so nodes are the discriminating comparison)."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [d for d, _, _ in SEED_GOLDENS],
                "doc_text": [t for _, t, _ in SEED_GOLDENS],
            }
        )
    )
    graphs = extract.extract_graphs(df)
    got_nodes = {}
    for r in extract.nodes_table(graphs).collect():
        got_nodes.setdefault(r["doc_id"], []).append(
            (r["node_id"], r["label"], r["node_type"])
        )
    got_triples = extract.triples_table(graphs).count()
    assert got_triples == 0
    for doc_id, _, golden in SEED_GOLDENS:
        got = sorted(got_nodes[doc_id], key=lambda t: int(t[0][1:]))
        assert got == golden, (doc_id, got)


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
