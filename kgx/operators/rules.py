"""Deterministic rule-based graph extraction — the behavioral contract.

This module is the single pure-Python implementation of the reference
extractor's deterministic path (reference: services.py:379-547,
``KnowledgeGraphExtractor._extract_with_rules`` and helpers).  It is executed
ONLY inside Arrow-batched ``mapInPandas`` workers (see
:mod:`kgx.operators.extract`) — never row-at-a-time from the driver.

The regex patterns and their evaluation order ARE the spec: several verified
quirks of the reference are intentionally preserved because the P/R>=0.95
target is measured against the reference's actual output, bugs included:

* CamelCase tokens ("TechStart", "SmartBot") are never matched as mentions —
  the leading ``\\b`` plus ``[A-Z][a-z]+`` cannot start mid-word or cross an
  internal capital (reference services.py:392-393).
* The stop-word filter is exact-match only; "The Engineering Department"
  survives while bare "The" is dropped (services.py:396-397).
* Relationship matching runs with ``re.IGNORECASE``, which lets the greedy
  entity sub-pattern over-capture spans like "Acme Corporation in New York";
  the over-captured label then fails node resolution and the edge is silently
  dropped (services.py:472-505).
* Mention dedup is first-occurrence, case-sensitive; the per-document entity
  cap is 15 (services.py:399-407).
* Edge dedup on (source, target, relationship) node-id triples is global per
  document across sentences (services.py:494-500).

All patterns are compiled once at module import (once per executor worker
process), so per-batch cost is pure matching.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

# --------------------------------------------------------------------------
# Pattern tables (spec: reference services.py:389-470, 507-547)
# --------------------------------------------------------------------------

#: Sentence boundary split (services.py:389).
SENTENCE_SPLIT_RX = re.compile(r"[.!?]+")

#: Capitalized multi-word mention detector (services.py:392).
MENTION_RX = re.compile(r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*\b")

#: Exact-match stop words (services.py:396).
STOP_WORDS = frozenset(
    {
        "In", "The", "A", "An", "This", "That", "These", "Those",
        "It", "Is", "Was", "Are", "Were", "Be", "Been",
    }
)

#: Per-document unique-mention cap (services.py:407).
MENTION_CAP = 15

# The entity sub-pattern used inside every relationship regex.  NOTE: inside
# relationship patterns the reference anchors only the LEADING word boundary
# and omits the trailing one (services.py:438-469) — kept verbatim.
_E = r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*"

#: Relationship pattern SOURCE strings in evaluation order
#: (services.py:436-470).  Kept as raw strings so the DuckDB oracle SQL
#: (kgx.oracles) embeds the exact same patterns — one table, no drift.
#: The single 3-group pattern ("X founded Y in Z") additionally fans out
#: (Y, located_in, Z) (services.py:477-481).
RELATION_PATTERN_SPECS: List[Tuple[str, str]] = [
        # CEO / CTO
        (rf"({_E})\s+is\s+the\s+CEO\s+of\s+({_E})", "ceo_of"),
        (rf"({_E})\s+is\s+the\s+CTO\s+of\s+({_E})", "cto_of"),
        # employment
        (
            rf"({_E})\s+(?:works?|worked|working)\s+(?:as\s+a?\s+)?"
            rf"(?:\w+\s+)?(?:at|for|in|with)\s+({_E})",
            "works_at",
        ),
        # founding — 3-group variant first, then generic
        (rf"({_E})\s+founded\s+({_E})\s+in\s+({_E})", "founded"),
        (rf"({_E})\s+(?:founded|established|created|started)\s+({_E})", "founded"),
        # location
        (rf"({_E})\s+in\s+({_E})\s+in\s+\d{{4}}", "located_in"),
        (rf"({_E}),?\s+(?:headquartered|located|based)\s+in\s+({_E})", "located_in"),
        (rf"({_E})\s+is\s+located\s+in\s+(?:the\s+)?({_E})", "located_in"),
        # acquisition
        (rf"({_E})\s+acquired\s+({_E})\s+(?:for|in)", "acquired"),
        (rf"({_E})\s+(?:acquired|bought|purchased)\s+({_E})", "acquired"),
        # management
        (rf"({_E})\s+(?:manages|managed|leads|led|oversees)\s+(?:the\s+)?({_E})", "manages"),
        # membership / role
        (rf"({_E})\s+serves\s+as\s+(?:\w+\s+)?of\s+({_E})", "member_of"),
        (rf"({_E})\s+now\s+serves\s+as\s+\w+\s+of\s+({_E})", "member_of"),
        # development
        (
            rf"({_E})\s+developed\s+(?:an?\s+)?(?:\w+\s+)?(?:platform\s+)?called\s+({_E})",
            "developed",
        ),
        (rf"({_E})\s+(?:developed|built|designed|created)\s+({_E})", "developed"),
        # usage
        (rf"({_E})\s+is\s+used\s+by\s+({_E})", "used_by"),
]

RELATION_PATTERNS: List[Tuple[re.Pattern, str]] = [
    (re.compile(p, re.IGNORECASE), rel) for p, rel in RELATION_PATTERN_SPECS
]

#: Cheap substring pre-filters, aligned 1:1 with RELATION_PATTERNS.  Each
#: regex contains a mandatory literal keyword; if none of a pattern's
#: keywords occur in the lowercased sentence the regex cannot match, so the
#: (much more expensive) findall is skipped.  Pure optimization — the guard
#: keywords are provably required by the corresponding pattern literals
#: above, so match results are byte-identical with or without the guards.
_RELATION_GUARDS: List[Tuple[str, ...]] = [
    ("ceo",),
    ("cto",),
    ("work",),
    ("founded",),
    ("founded", "established", "created", "started"),
    ("in",),
    ("headquartered", "located", "based"),
    ("located",),
    ("acquired",),
    ("acquired", "bought", "purchased"),
    ("manage", "lead", "led", "oversee"),
    ("serves",),
    ("serves",),
    ("called",),
    ("developed", "built", "designed", "created"),
    ("used",),
]
_GUARDED_PATTERNS = list(zip(RELATION_PATTERNS, _RELATION_GUARDS, strict=True))

# Entity-type keyword cascades (services.py:514-531); order matters.
_ORG_KEYWORDS = (
    "corporation", "corp", "company", "inc", "ltd", "llc",
    "university", "institute", "department", "division",
)
_LOC_KEYWORDS = (
    "city", "country", "state", "street", "avenue", "road",
    "york", "francisco", "london", "paris", "tokyo",
)
_TECH_KEYWORDS = ("bot", "app", "system", "platform", "software", "tool", "ai", "tech")
_TITLE_KEYWORDS = (
    "engineer", "manager", "director", "ceo", "cto", "cfo",
    "president", "vice president",
)


@lru_cache(maxsize=65536)
def _person_context_pattern(label: str) -> re.Pattern:
    """One combined person-context regex per label (the classifier only
    needs ANY-of-three, so a single alternation halves regex scans).  Labels
    repeat heavily across documents, so caching avoids recompiling (and
    thrashing the small ``re`` module cache) once per (label, doc) pair."""
    esc = re.escape(label)
    return re.compile(
        rf"{esc}\s+(?:is|was|works|worked|manages|founded)"
        rf"|(?:Mr\.|Mrs\.|Dr\.|Ms\.)\s+{esc}"
        rf"|{esc}\s+(?:serves as|joined|left)",
        re.IGNORECASE,
    )


# string-scan twin of _person_context_pattern: the per-label IGNORECASE regex
# rescans the WHOLE document per unclassified mention (~25% of extraction
# time profiled); the fast path find()s the (rare) label occurrences in the
# pre-lowered text and checks the same contexts with C-speed prefix/suffix
# string ops.  Applicable iff lower() is length-preserving (guard below) so
# positions line up with IGNORECASE semantics; the alternation prefixes are
# matched exactly like the regex (no trailing word boundary — preserved).
_CTX_SUFFIXES = ("is", "was", "works", "worked", "manages", "founded",
                 "serves as", "joined", "left")
_CTX_TITLES = ("mr.", "mrs.", "dr.", "ms.")
_WS_RX = re.compile(r"\s+")
_WS_ONE = re.compile(r"\s")


def _person_context_fast(label_lower: str, text_lower: str) -> bool:
    n, start = len(label_lower), 0
    while True:
        i = text_lower.find(label_lower, start)
        if i < 0:
            return False
        m = _WS_RX.match(text_lower, i + n)
        if m:  # label followed by \s+ — check the verb alternatives
            k = m.end()
            for v in _CTX_SUFFIXES:
                if text_lower.startswith(v, k):
                    return True
        p = i
        while p > 0 and _WS_ONE.match(text_lower, p - 1):
            p -= 1
        if p < i:  # \s+ before the label — check the title prefixes
            for t in _CTX_TITLES:
                if text_lower.endswith(t, 0, p):
                    return True
        start = i + 1


def classify_entity(label: str, doc_text: str, doc_text_lower: str | None = None) -> str:
    """Entity-type heuristic (services.py:507-547). Order of checks matters.
    Plain for-loops instead of any(genexpr): this runs per (mention, doc) in
    the hot path and generator frames were ~20% of extraction time.

    ``doc_text_lower`` (precomputed once per doc by the caller) enables the
    string-scan person-context fast path; it is used only when lowering
    preserved length (position alignment with the IGNORECASE regex — a
    handful of unicode codepoints expand under lower()), else the regex twin
    runs.  Both paths are equivalence-tested property-wise."""
    low = label.lower()
    for k in _ORG_KEYWORDS:
        if k in low:
            return "Organization"
    for k in _LOC_KEYWORDS:
        if k in low:
            return "Location"
    for k in _TECH_KEYWORDS:
        if k in low:
            return "Technology"
    for k in _TITLE_KEYWORDS:
        if k in low:
            return "JobTitle"
    if doc_text_lower is not None and len(doc_text_lower) == len(doc_text):
        is_person = _person_context_fast(low, doc_text_lower)
    else:
        is_person = bool(_person_context_pattern(label).search(doc_text))
    if is_person:
        return "Person"
    parts = label.split()
    if len(parts) == 2 and all(w[0].isupper() for w in parts):
        return "Person"
    return "Entity"


def detect_mentions(text: str) -> List[str]:
    """Whole-document mention scan → stop-word filter → first-occurrence
    dedup → cap at 15, preserving first-appearance order
    (services.py:392-407)."""
    seen = set()
    out: List[str] = []
    for m in MENTION_RX.findall(text):
        if m in STOP_WORDS or m in seen:
            continue
        seen.add(m)
        out.append(m)
        if len(out) == MENTION_CAP:
            break
    return out


def extract_document(
    text: str,
) -> Tuple[List[Tuple[str, str, str]], List[Tuple[str, str, str]], List[Tuple[str, str, str]]]:
    """Run the full rule pipeline on one document's text.

    Returns ``(nodes, edges, triples)`` where
      nodes   = [(node_id, label, node_type), ...] in n1,n2,... order
      edges   = [(src_node_id, dst_node_id, relationship), ...]
      triples = [(subj_label, relationship, obj_label), ...] label-resolved,
                aligned 1:1 with ``edges``.
    """
    if not text or not text.strip():
        return [], [], []

    labels = detect_mentions(text)
    text_low = text.lower()  # one lowering per doc, shared by the classifier
    nodes = [
        (f"n{i + 1}", label, classify_entity(label, text, text_low))
        for i, label in enumerate(labels)
    ]
    # case-insensitive resolution map: first insertion wins (lower(label) is
    # unique by construction of MENTION_RX, but keep first-wins semantics)
    by_lower: Dict[str, Tuple[str, str]] = {}
    for node_id, label, _ in nodes:
        by_lower.setdefault(label.lower(), (node_id, label))

    edges: List[Tuple[str, str, str]] = []
    triples: List[Tuple[str, str, str]] = []
    edge_seen = set()

    def add_edge(src_label: str, dst_label: str, rel: str) -> None:
        s = by_lower.get(src_label.lower())
        t = by_lower.get(dst_label.lower())
        # unresolved endpoint or self-pair → silently dropped
        # (services.py:489-492); over-captured IGNORECASE labels land here.
        if s is None or t is None or s[0] == t[0]:
            return
        key = (s[0], t[0], rel)
        if key in edge_seen:
            return
        edge_seen.add(key)
        edges.append(key)
        triples.append((s[1], rel, t[1]))

    for sentence in SENTENCE_SPLIT_RX.split(text):
        sentence = sentence.strip()
        if not sentence:
            continue
        s_low = sentence.lower()
        for (rx, rel), guards in _GUARDED_PATTERNS:
            for g in guards:
                if g in s_low:
                    break
            else:
                continue
            for match in rx.findall(sentence):
                if len(match) == 3:
                    subj, obj, loc = match
                    add_edge(subj, obj, rel)
                    add_edge(obj, loc, "located_in")
                else:
                    subj, obj = match
                    add_edge(subj, obj, rel)

    return nodes, edges, triples
