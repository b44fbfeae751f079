"""Golden tests for the rule engine against VERIFIED reference outputs.

Goldens below were produced by executing the actual reference extractor
(/root/reference/services.py:379-547, USE_OLLAMA=False) during the survey —
see FIXTURES.md §3.  They encode the reference's quirks (CamelCase exclusion,
IGNORECASE over-capture edge drops, global per-doc edge dedup) as the spec.
"""

from kgx.operators import rules

F1_SAMPLE = (
    "John Doe is the CEO of Acme Corporation, headquartered in New York City. "
    "Jane Smith founded TechStart in San Francisco in 2020. "
    "In 2024, Acme Corporation acquired TechStart for $50 million. "
    "John Doe manages the Engineering Department at Acme. "
    "Sarah Johnson works as a Senior Engineer at Acme Corporation. "
    "TechStart developed an AI platform called SmartBot. "
    "SmartBot is used by companies worldwide. "
    "Jane Smith now serves as CTO of Acme Corporation. "
    "The Engineering Department is located in the New York office."
)

F2_TEST = (
    "John Doe works at Acme Corporation in New York. "
    "Shubham also works at Acme Corporation in Patna."
)


def test_f1_sample_document_nodes_and_triples():
    nodes, edges, triples = rules.extract_document(F1_SAMPLE)
    labels = [n[1] for n in nodes]
    assert labels == [
        "John Doe",
        "Acme Corporation",
        "New York City",
        "Jane Smith",
        "San Francisco",
        "Engineering Department",
        "Acme",
        "Sarah Johnson",
        "Senior Engineer",
        "The Engineering Department",
        "New York",
    ]
    types = dict((n[1], n[2]) for n in nodes)
    assert types["John Doe"] == "Person"
    assert types["Acme Corporation"] == "Organization"
    assert types["New York City"] == "Location"
    assert types["Jane Smith"] == "Person"
    assert types["San Francisco"] == "Location"
    assert types["Engineering Department"] == "Organization"
    assert types["Acme"] == "Entity"
    assert types["Sarah Johnson"] == "Person"
    assert types["Senior Engineer"] == "JobTitle"
    assert types["The Engineering Department"] == "Organization"
    assert types["New York"] == "Location"
    # CamelCase names never match the mention pattern
    assert "TechStart" not in labels and "SmartBot" not in labels
    assert set(triples) == {
        ("John Doe", "ceo_of", "Acme Corporation"),
        ("Jane Smith", "member_of", "Acme Corporation"),
    }


def test_f2_ignorecase_overcapture_drops_all_edges():
    nodes, edges, triples = rules.extract_document(F2_TEST)
    assert [n[1] for n in nodes] == [
        "John Doe",
        "Acme Corporation",
        "New York",
        "Shubham",
        "Patna",
    ]
    assert triples == []  # works_at target over-captures → unresolved → dropped


def test_f6_camelcase_lowercased_founded_fanout():
    nodes, edges, triples = rules.extract_document(
        "Jane Smith founded Techstart in San Francisco in 2020."
    )
    assert [n[1] for n in nodes] == ["Jane Smith", "Techstart", "San Francisco"]
    types = dict((n[1], n[2]) for n in nodes)
    assert types["Techstart"] == "Technology"  # 'tech' keyword
    # located_in leg of 3-group fan-out drops (greedy over-capture)
    assert set(triples) == {("Jane Smith", "founded", "Techstart")}


def test_f7_edge_dedup_is_global_per_document():
    _, _, triples = rules.extract_document(
        "John Doe is the CEO of Acme Corporation. "
        "John Doe is the CEO of Acme Corporation."
    )
    assert triples == [("John Doe", "ceo_of", "Acme Corporation")]


def test_f8_stop_words_exact_match_only():
    nodes, _, _ = rules.extract_document(
        "The Engineering Department is located in the New York office. It is the best."
    )
    labels = [n[1] for n in nodes]
    assert "The Engineering Department" in labels
    assert "The" not in labels and "It" not in labels and "Is" not in labels


def test_f9_empty_and_whitespace_text():
    assert rules.extract_document("") == ([], [], [])
    assert rules.extract_document("   \n\t ") == ([], [], [])


def test_f12_entity_cap_keeps_first_15_in_order():
    names = [f"Alice{chr(97 + i)} Brown{chr(97 + i)}".title() for i in range(20)]
    text = " ".join(f"{n} attended." for n in names)
    nodes, _, _ = rules.extract_document(text)
    assert len(nodes) == 15
    assert [n[1] for n in nodes] == names[:15]
    assert [n[0] for n in nodes] == [f"n{i}" for i in range(1, 16)]
