"""LLM-source plumbing (S7/S8 shape) and security predicates (P10)."""

import pandas as pd
import pytest

from kgx.operators import rules, security
from kgx.sources import llm


def test_llm_fake_path_matches_rule_engine(spark):
    texts = {
        "d1": "John Doe is the CEO of Acme Corporation.",
        "d2": "Jane Smith founded Techstart in San Francisco in 2020.",
        "d3": "",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "doc_text": list(texts.values())})
    )
    got = {r["doc_id"]: r for r in llm.llm_graphs(df, fake=True).collect()}
    for doc_id, text in texts.items():
        nodes, edges, _ = rules.extract_document(text)
        g = got[doc_id]
        assert [(n["id"], n["label"], n["type"]) for n in g["nodes"]] == nodes
        assert [(e["source"], e["target"], e["relationship"]) for e in g["edges"]] == edges


def test_llm_real_path_raises_cleanly(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["x"], "doc_text": ["Some Text here."]})
    )
    with pytest.raises(Exception) as exc:
        llm.llm_responses(df, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "endpoint" in str(exc.value)


def test_prompt_cap():
    p = llm.extraction_prompt("x" * 10_000)
    assert len(p) < 11_000 and "x" * 2001 not in p


def test_security_classification(spark):
    refs = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": [
                    "s3://m/good.png",
                    "s3://m/evil.exe",
                    "s3://m/a/../traversal.png",
                    "s3://m/odd.xyz",
                    "s3://m/enc%2e%2e.jpg",
                ]
            }
        )
    )
    got = {r["media_ref"]: r["accepted"] for r in security.classify_refs(refs).collect()}
    assert got["s3://m/good.png"] is True
    assert got["s3://m/evil.exe"] is False
    assert got["s3://m/a/../traversal.png"] is False
    assert got["s3://m/odd.xyz"] is False
    assert got["s3://m/enc%2e%2e.jpg"] is False
