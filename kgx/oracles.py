"""DuckDB oracle SQL for every KG pipeline stage.

The driver's correctness gate runs each Spark query side-by-side with an ANSI
SQL equivalent on DuckDB over the same parquet tables.  This module generates
that SQL *from the same pattern tables the engine executes*
(:mod:`kgx.operators.rules`, :mod:`kgx.sources.corpus`), so the two sides
cannot drift: the regexes, stop words, keyword cascades and template
vocabulary are interpolated from one source of truth.

Python ``re`` (engine side, inside Arrow batches) and DuckDB's RE2 agree on
every construct these patterns use (leftmost-first alternation, greedy
quantifiers, ``\\b``, ``(?i)``, ``\\s``/``\\w``/``\\d`` over ASCII) — verified
empirically by tools/compare_oracle.py at sf0.01.
"""

from __future__ import annotations

from kgx.operators import rules
from kgx.sources.corpus import NARRATIVE_CTE

# ---------------------------------------------------------------------------
# shared CTE prefix: narrative corpus → chunked spans → rebuilt doc text
# ---------------------------------------------------------------------------

_BASE = f"""
WITH {NARRATIVE_CTE},
chunked AS (
    SELECT 'doc-' || doc_id AS doc_id,
           doc_id AS did,
           list_filter(
               list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'),
                              c -> regexp_replace(c, '^\\s+|\\s+$', '', 'g')),
               c -> c <> '') AS chunks
    FROM narrative
),
doctext AS (
    SELECT doc_id, did, array_to_string(chunks, ' ') AS text FROM chunked
)
""".strip()

_STOPLIST = ", ".join(f"'{w}'" for w in sorted(rules.STOP_WORDS))

_MENTION_SQL_RX = r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*\b"

# mentions → stop-word filter → first occurrence → cap 15 → node ids
_NODES_CTES = f"""
raw_mentions AS (
    SELECT doc_id,
           unnest(regexp_extract_all(text, '{_MENTION_SQL_RX}')) AS label,
           generate_subscripts(regexp_extract_all(text, '{_MENTION_SQL_RX}'), 1) AS ord
    FROM doctext
),
first_seen AS (
    SELECT doc_id, label, min(ord) AS first_ord
    FROM raw_mentions
    WHERE label NOT IN ({_STOPLIST})
    GROUP BY doc_id, label
),
capped AS (
    SELECT doc_id, label,
           row_number() OVER (PARTITION BY doc_id ORDER BY first_ord) AS rnk
    FROM first_seen
    QUALIFY rnk <= {rules.MENTION_CAP}
),
nodes AS (
    SELECT c.doc_id, 'n' || c.rnk AS node_id, c.label, c.rnk, d.text
    FROM capped c JOIN doctext d USING (doc_id)
)
""".strip()


def _keyword_like(col: str, keywords) -> str:
    return "(" + " OR ".join(f"lower({col}) LIKE '%{k}%'" for k in keywords) + ")"


def _node_type_case() -> str:
    """SQL mirror of rules.classify_entity (reference services.py:507-547)."""
    org = _keyword_like("label", rules._ORG_KEYWORDS)
    loc = _keyword_like("label", rules._LOC_KEYWORDS)
    tech = _keyword_like("label", rules._TECH_KEYWORDS)
    title = _keyword_like("label", rules._TITLE_KEYWORDS)
    # labels only contain [A-Za-z ] (mention regex), so no regex-escaping is
    # needed when interpolating the label into the context patterns
    p1 = r"label || '\s+(?:is|was|works|worked|manages|founded)'"
    p2 = r"'(?:Mr\.|Mrs\.|Dr\.|Ms\.)\s+' || label"
    p3 = r"label || '\s+(?:serves as|joined|left)'"
    return f"""
        CASE
          WHEN {org} THEN 'Organization'
          WHEN {loc} THEN 'Location'
          WHEN {tech} THEN 'Technology'
          WHEN {title} THEN 'JobTitle'
          WHEN regexp_matches(text, '(?i)' || {p1}) THEN 'Person'
          WHEN regexp_matches(text, '(?i)' || {p2}) THEN 'Person'
          WHEN regexp_matches(text, '(?i)' || {p3}) THEN 'Person'
          WHEN len(str_split(label, ' ')) = 2 THEN 'Person'
          ELSE 'Entity'
        END
    """.strip()


def spans_sql() -> str:
    """Oracle for the interleaved span table (kgx.sources.docs.spans_table)."""
    return f"""
{_BASE},
per_chunk AS (
    SELECT doc_id, did,
           unnest(chunks) AS chunk,
           generate_subscripts(chunks, 1) - 1 AS ci
    FROM chunked
),
sp AS (
    SELECT doc_id, ci, 0 AS sub, 'text' AS kind, chunk AS text, '' AS media_ref
    FROM per_chunk
    UNION ALL
    SELECT doc_id, ci, 1, 'media', '',
           's3://media/doc-' || did || '-' || ci || '.png'
    FROM per_chunk WHERE (did + ci) % 5 = 2
)
SELECT doc_id, kind, text, media_ref,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ci, sub) - 1 AS INT)
           AS span_pos
FROM sp
""".strip()


def doc_text_sql() -> str:
    return f"{_BASE}\nSELECT doc_id, text AS doc_text FROM doctext"


def mentions_sql() -> str:
    return f"""
{_BASE},
{_NODES_CTES}
SELECT doc_id, label, CAST(rnk AS INT) AS mention_rank FROM nodes
""".strip()


def nodes_sql() -> str:
    return f"""
{_BASE},
{_NODES_CTES}
SELECT doc_id, node_id, label, {_node_type_case()} AS node_type FROM nodes
""".strip()


def _stem_sql(col: str) -> str:
    """SQL mirror of kgx.operators.linking.normalized_stem."""
    from kgx.operators.linking import _SUFFIX_RX

    return (
        f"trim(regexp_replace(regexp_replace(lower({col}), '{_SUFFIX_RX}', ''),"
        " '\\s+', ' ', 'g'))"
    )


def canonical_map_sql() -> str:
    """Oracle for alias-based canonicalization.  Alias edges connect exactly
    the labels sharing a normalized stem, so the connected components the
    engine computes via large-star/small-star are the stem equivalence
    classes — the oracle is a plain window-min over stems."""
    return f"""
{_BASE},
{_NODES_CTES},
labs AS (SELECT DISTINCT label FROM nodes),
stemmed AS (SELECT label, {_stem_sql('label')} AS stem FROM labs)
SELECT label,
       min(label) OVER (PARTITION BY stem) AS canonical_label,
       sha256(min(label) OVER (PARTITION BY stem)) AS canonical_id
FROM stemmed
""".strip()


def canonical_triples_sql() -> str:
    """Oracle for triples rewritten through the canonical map + dedup."""
    tri = triples_sql()
    # reuse the full triples query as a CTE; it already defines `nodes`
    body = tri[len("WITH "):]
    head, tail = body.rsplit("SELECT DISTINCT doc_id, subj, pred, obj FROM resolved", 1)
    assert tail == ""
    return f"""
WITH {head.rstrip()},
tri AS (SELECT DISTINCT doc_id, subj, pred, obj FROM resolved),
labs AS (SELECT DISTINCT label FROM nodes),
cmap AS (
    SELECT label, min(label) OVER (PARTITION BY {_stem_sql('label')}) AS canonical_label
    FROM labs
)
SELECT DISTINCT t.doc_id,
       coalesce(cs.canonical_label, t.subj) AS subj,
       t.pred,
       coalesce(co.canonical_label, t.obj) AS obj
FROM tri t
LEFT JOIN cmap cs ON cs.label = t.subj
LEFT JOIN cmap co ON co.label = t.obj
""".strip()


def triples_sql() -> str:
    """Oracle for label-resolved (subj, pred, obj) triples — the P/R unit."""
    two_group = [
        (rx, rel)
        for rx, rel in rules.RELATION_PATTERN_SPECS
        if rx.count("(") - rx.count("(?:") == 2
    ]
    three_group = [
        (rx, rel)
        for rx, rel in rules.RELATION_PATTERN_SPECS
        if rx.count("(") - rx.count("(?:") == 3
    ]
    assert len(two_group) + len(three_group) == len(rules.RELATION_PATTERN_SPECS)
    pat_rows = ",\n        ".join(
        f"('(?i){rx}', '{rel}')" for rx, rel in two_group
    )
    f3 = f"'(?i){three_group[0][0]}'"
    f3_rel = f"'{three_group[0][1]}'"
    return f"""
{_BASE},
{_NODES_CTES},
sentences AS (
    SELECT doc_id,
           regexp_replace(unnest(regexp_split_to_array(text, '[.!?]+')),
                          '^\\s+|\\s+$', '', 'g') AS sentence
    FROM doctext
),
sent AS (SELECT doc_id, sentence FROM sentences WHERE sentence <> ''),
pats(rx, rel) AS (
    VALUES
        {pat_rows}
),
cand2 AS (
    SELECT doc_id, rel,
           unnest(regexp_extract_all(sentence, rx, 1)) AS src_label,
           unnest(regexp_extract_all(sentence, rx, 2)) AS dst_label
    FROM sent CROSS JOIN pats
),
cand3m AS (
    SELECT doc_id,
           unnest(regexp_extract_all(sentence, {f3}, 1)) AS g1,
           unnest(regexp_extract_all(sentence, {f3}, 2)) AS g2,
           unnest(regexp_extract_all(sentence, {f3}, 3)) AS g3
    FROM sent
),
cand AS (
    SELECT doc_id, rel, src_label, dst_label FROM cand2
    UNION ALL
    SELECT doc_id, {f3_rel}, g1, g2 FROM cand3m
    UNION ALL
    SELECT doc_id, 'located_in', g2, g3 FROM cand3m
),
resolved AS (
    SELECT c.doc_id, sn.label AS subj, c.rel AS pred, tn.label AS obj
    FROM cand c
    JOIN nodes sn ON sn.doc_id = c.doc_id
                 AND lower(sn.label) = lower(c.src_label)
    JOIN nodes tn ON tn.doc_id = c.doc_id
                 AND lower(tn.label) = lower(c.dst_label)
    WHERE sn.node_id <> tn.node_id
)
SELECT DISTINCT doc_id, subj, pred, obj FROM resolved
""".strip()
