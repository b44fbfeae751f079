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


def test_llm_real_client_with_injected_transport(spark):
    """fake=False runs the actual client loop; a recording transport stands
    in for the socket.  Verifies the Ollama payload contract (reference
    services.py:193-207) and that responses flow through to rows."""

    def transport(url, headers, body, timeout):
        assert url.endswith("/api/generate")
        assert body["format"] == "json" and body["stream"] is False
        assert "Text to analyze" in body["prompt"]
        assert timeout == 120.0
        return 200, {"response": '{"nodes": [], "edges": []}'}

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["x"], "doc_text": ["Some Text here."]})
    )
    rows = llm.llm_responses(df, fake=False, transport=transport).collect()
    assert rows[0]["response"] == '{"nodes": [], "edges": []}'


def test_llm_unreachable_endpoint_degrades_to_null_not_crash(spark):
    """No network in this sandbox: the default transport's connect failure
    must exhaust retries and yield a NULL response (the reference falls back
    to rules on LLM failure, services.py:113-115) — never kill the job."""
    cfg = llm.LLMClientConfig(max_retries=0, timeout_sec=1.0)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["x"], "doc_text": ["Some Text here."]})
    )
    rows = llm.llm_responses(df, fake=False, cfg=cfg).collect()
    assert rows[0]["response"] is None


def test_call_model_retry_classification():
    """5xx retries with exponential backoff then None; 4xx returns None
    immediately; 200 returns the text.  Virtual sleep records the backoff."""
    cfg = llm.LLMClientConfig(max_retries=2, backoff_base_sec=0.5)
    slept = []
    calls = []

    def t500(url, h, b, to):
        calls.append(1)
        return 500, {}

    out = llm.call_model(cfg, "p", t500, sleep=slept.append)
    assert out is None and len(calls) == 3 and slept == [0.5, 1.0]

    calls.clear()
    out = llm.call_model(cfg, "p", lambda *a: (429, {}), sleep=slept.append)
    assert out is None  # 4xx: no retry
    out = llm.call_model(cfg, "p", lambda *a: (200, {"response": "ok"}))
    assert out == "ok"


def test_openai_payload_shape():
    cfg = llm.LLMClientConfig(backend="openai", api_key="k", model="m")
    url, headers, body = llm._request(cfg, "hello")
    assert url.endswith("/v1/chat/completions")
    assert headers["Authorization"] == "Bearer k"
    assert body["messages"][0]["content"] == "hello"
    assert llm._response_text(cfg, {"choices": [{"message": {"content": "c"}}]}) == "c"


def test_token_bucket_enforces_rate_in_virtual_time():
    now = [0.0]
    slept = []

    def clock():
        return now[0]

    def sleep(s):
        slept.append(s)
        now[0] += s

    bucket = llm.TokenBucket(rate=2.0, capacity=1.0, clock=clock, sleep=sleep)
    for _ in range(5):
        bucket.acquire()
    # 1 free token, then 4 waits of 0.5 s at 2 rps
    assert now[0] == pytest.approx(2.0)
    assert all(s == pytest.approx(0.5) for s in slept)


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
