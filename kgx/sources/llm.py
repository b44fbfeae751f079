"""LLM extraction source — the S7/S8 shape, stubbed for this sandbox.

The reference calls Ollama/OpenAI per document with a JSON-format prompt
(reference services.py:178-231, 322-377; 120 s timeout, 2000-char prompt
cap).  That path is non-deterministic and network-bound, so it is NOT part
of the engine's correctness contract (the deterministic rule path is —
reference services.py:113-115 falls back to it on any LLM failure).

What IS replicated here is the *Spark-correct shape* for such a source:
an Arrow-batched ``mapInPandas`` stage that (a) builds prompts JVM-free,
(b) would issue batched HTTP calls with client-side rate limiting from each
executor, and (c) funnels responses through the same J1→J3 parse/coerce
stages as any other JSON (kgx.operators.jsonio).  ``fake=True`` substitutes
a deterministic responder (the rule engine serialized as an LLM-style
fenced-JSON reply) so the plumbing — prompt cap, fence stripping, coercion,
endpoint validation — is fully testable offline.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROMPT_CAP = 2000  # reference services.py:375
REQUESTS_PER_SECOND = 4.0  # client-side budget per executor task


def extraction_prompt(text: str) -> str:
    """Prompt contract mirroring the reference's shape (services.py:355-377)."""
    return (
        "Extract entities and relationships from the following text and "
        "return ONLY a valid JSON object with keys nodes/edges.\n\n"
        f"Text to analyze:\n{text[:PROMPT_CAP]}\n\nReturn ONLY the JSON object."
    )


def _fake_response(text: str) -> str:
    """Deterministic LLM stand-in: rule-engine output wrapped the way real
    models tend to reply (markdown fence + prose)."""
    from kgx.operators import rules

    nodes, edges, _ = rules.extract_document(text or "")
    payload = {
        "nodes": [{"id": n, "label": l, "type": t} for n, l, t in nodes],
        "edges": [{"source": s, "target": d, "relationship": r} for s, d, r in edges],
    }
    return "Here is the graph:\n```json\n" + json.dumps(payload) + "\n```"


RESPONSE_SCHEMA = "doc_id string, response string"


def llm_responses(docs_with_text: DataFrame, fake: bool = True) -> DataFrame:
    """(doc_id, doc_text) → (doc_id, response raw-LLM-text).

    ``fake=False`` is the production signature: each Arrow batch would POST
    prompts to the model endpoint with a token-bucket rate limiter and
    per-request timeout.  No network exists in this sandbox, so it raises.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no model endpoint in this environment; production code "
                    "POSTs extraction_prompt() per row here with a "
                    f"{REQUESTS_PER_SECOND}/s token bucket and retry/backoff"
                )
            out = [_fake_response(t) for t in pdf["doc_text"].tolist()]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "response": out})

    return docs_with_text.select("doc_id", "doc_text").mapInPandas(
        _run, schema=RESPONSE_SCHEMA
    )


def llm_graphs(docs_with_text: DataFrame, fake: bool = True) -> DataFrame:
    """Full LLM-source path: responses → fence strip → J1 parse → J3 coerce.
    Returns (doc_id, nodes, edges) with the jsonio graph schema."""
    from kgx.operators import jsonio

    resp = llm_responses(docs_with_text, fake=fake)
    # J1 fence-stripping strategy: prefer fenced block, else outermost braces
    extracted = resp.withColumn(
        "graph_json",
        F.coalesce(
            F.nullif(F.regexp_extract("response", r"```json\s*(\{[\s\S]*?\})\s*```", 1), F.lit("")),
            F.nullif(F.regexp_extract("response", r"(?s)(\{.*\})", 1), F.lit("")),
        ),
    )
    return jsonio.coerce_graph(jsonio.parse_graph_json(extracted, "graph_json")).select(
        "doc_id", "nodes", "edges"
    )
