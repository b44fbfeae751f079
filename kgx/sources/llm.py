"""LLM extraction source — S7/S8 with a real (transport-injectable) client.

The reference calls Ollama/OpenAI per document with a JSON-format prompt
(reference services.py:178-231, 322-377; 120 s timeout, 2000-char prompt
cap).  That path is non-deterministic and network-bound, so it is NOT part
of the engine's correctness contract (the deterministic rule path is —
reference services.py:113-115 falls back to it on any LLM failure).

Round 2: the client is real code, not prose.  Each executor task runs a
token-bucket rate limiter (REQUESTS_PER_SECOND budget per task — cluster-wide
QPS = tasks × rate, which is how you provision a model endpoint behind a
Spark job) and a bounded exponential-backoff retry loop around an injected
``transport`` callable.  The default transport uses urllib from the standard
library; tests inject fakes to verify payload shape, rate limiting, retry
classification, and failure fallback — everything except the socket itself,
which this sandbox cannot open.  ``fake=True`` substitutes a deterministic
responder (the rule engine serialized as an LLM-style fenced-JSON reply) so
the downstream plumbing — prompt cap, fence stripping, J1→J3 parse/coerce —
is fully exercised offline.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator, Optional, Tuple

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


# ---------------------------------------------------------------------------
# client: config, rate limiter, transport, retry loop
# ---------------------------------------------------------------------------

#: transport signature: (url, headers, json_body, timeout_sec) ->
#: (http_status, parsed_json_body).  Injected in tests; urllib by default.
Transport = Callable[[str, dict, dict, float], Tuple[int, dict]]


@dataclass
class LLMClientConfig:
    """Model-endpoint config (reference config.py settings surface)."""

    backend: str = "ollama"            # "ollama" | "openai"
    base_url: str = "http://localhost:11434"
    model: str = "llama3"
    api_key: str = ""                  # openai only
    timeout_sec: float = 120.0         # reference services.py:203
    requests_per_second: float = REQUESTS_PER_SECOND
    max_retries: int = 3
    backoff_base_sec: float = 0.5


class TokenBucket:
    """Minimal token-bucket limiter; ``clock``/``sleep`` injectable so tests
    run in virtual time."""

    def __init__(
        self,
        rate: float,
        capacity: float | None = None,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.rate = float(rate)
        self.capacity = float(capacity if capacity is not None else max(1.0, rate))
        self._tokens = self.capacity
        self._last = clock()
        self._clock, self._sleep = clock, sleep

    def acquire(self) -> None:
        while True:
            now = self._clock()
            self._tokens = min(self.capacity, self._tokens + (now - self._last) * self.rate)
            self._last = now
            if self._tokens >= 1.0:
                self._tokens -= 1.0
                return
            self._sleep((1.0 - self._tokens) / self.rate)


def _request(cfg: LLMClientConfig, prompt: str) -> Tuple[str, dict, dict]:
    """(url, headers, body) per backend — mirrors reference services.py:193-200
    (Ollama /api/generate, format=json) and 322-345 (OpenAI chat)."""
    if cfg.backend == "ollama":
        return (
            f"{cfg.base_url.rstrip('/')}/api/generate",
            {"Content-Type": "application/json"},
            {"model": cfg.model, "prompt": prompt, "stream": False, "format": "json"},
        )
    if cfg.backend == "openai":
        return (
            f"{cfg.base_url.rstrip('/')}/v1/chat/completions",
            {
                "Content-Type": "application/json",
                "Authorization": f"Bearer {cfg.api_key}",
            },
            {
                "model": cfg.model,
                "messages": [{"role": "user", "content": prompt}],
                "response_format": {"type": "json_object"},
            },
        )
    raise ValueError(f"unknown backend: {cfg.backend}")


def _response_text(cfg: LLMClientConfig, body: dict) -> str:
    if cfg.backend == "ollama":
        return body.get("response", "")  # services.py:207
    return body["choices"][0]["message"]["content"]  # services.py:348-350


def default_transport(url: str, headers: dict, body: dict, timeout: float) -> Tuple[int, dict]:
    """Standard-library HTTP POST (no external deps).  In this sandbox any
    call fails at connect time — which the retry loop then classifies."""
    import urllib.request

    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), headers=headers, method="POST"
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read().decode())


def call_model(
    cfg: LLMClientConfig,
    prompt: str,
    transport: Transport,
    bucket: Optional[TokenBucket] = None,
    sleep: Callable[[float], None] = time.sleep,
) -> Optional[str]:
    """One rate-limited, retried model call.  Returns the raw response text,
    or None after exhausting retries — the caller falls back to the
    deterministic rule path exactly like the reference (services.py:113-115),
    so a flaky endpoint degrades quality, never correctness."""
    url, headers, body = _request(cfg, prompt)
    for attempt in range(cfg.max_retries + 1):
        if bucket is not None:
            bucket.acquire()
        try:
            status, payload = transport(url, headers, body, cfg.timeout_sec)
        except Exception:
            status, payload = -1, {}
        if status == 200:
            return _response_text(cfg, payload)
        if 400 <= status < 500:
            return None  # client error: retrying cannot help
        if attempt < cfg.max_retries:
            sleep(cfg.backoff_base_sec * (2**attempt))
    return None


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------

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


def llm_responses(
    docs_with_text: DataFrame,
    fake: bool = True,
    cfg: LLMClientConfig | None = None,
    transport: Transport | None = None,
) -> DataFrame:
    """(doc_id, doc_text) → (doc_id, response raw-LLM-text).

    ``fake=False`` runs the real client: per-task token bucket +
    retry/backoff around ``transport`` (default: stdlib urllib POST).  Rows
    whose calls exhaust retries get a null response — downstream
    ``llm_graphs`` coercion turns those into empty graphs, and a production
    job unions in the rule-path extraction for exactly those docs (the
    reference's fallback, services.py:113-115)."""
    the_cfg = cfg or LLMClientConfig()
    the_transport = transport or default_transport

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = None if fake else TokenBucket(the_cfg.requests_per_second)
        for pdf in batches:
            if fake:
                out = [_fake_response(t) for t in pdf["doc_text"].tolist()]
            else:
                out = [
                    call_model(the_cfg, extraction_prompt(t or ""), the_transport, bucket)
                    for t in pdf["doc_text"].tolist()
                ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "response": out})

    return docs_with_text.select("doc_id", "doc_text").mapInPandas(
        _run, schema=RESPONSE_SCHEMA
    )


def llm_graphs(
    docs_with_text: DataFrame,
    fake: bool = True,
    cfg: LLMClientConfig | None = None,
    transport: Transport | None = None,
) -> DataFrame:
    """Full LLM-source path: responses → fence strip → J1 parse → J3 coerce.
    Returns (doc_id, nodes, edges) with the jsonio graph schema."""
    from kgx.operators import jsonio

    resp = llm_responses(docs_with_text, fake=fake, cfg=cfg, transport=transport)
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
