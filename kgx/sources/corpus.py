"""Deterministic KG narrative corpus, derived from the driver's documents table.

The sandbox's ``documents.parquet`` is lowercase bag-of-words text with no
capitalized entities — extraction over it is trivially empty.  The north rule
requires a synthetic interleaved corpus with **no external data**, so we
derive one *deterministically from the existing table* with pure SQL string
functions: token triples become templated narrative sentences drawn from the
reference's relationship vocabulary (reference services.py:436-470).

Crucially the derivation is rendered in TWO dialects from one template table:

- :func:`narrative_expr` → a Spark SQL expression (used by the engine), and
- :func:`narrative_duckdb_cte` → the equivalent DuckDB SQL (used by the
  driver's oracle), so every downstream operator — spans, mentions, nodes,
  triples — remains end-to-end checkable against an independent engine.

The Spark side is a single narrow projection (no UDF, no shuffle): corpus
synthesis scales linearly with input splits at any sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CITIES = [
    "New York", "San Francisco", "London", "Paris",
    "Tokyo", "Berlin", "Austin", "Madrid",
]


def _render(dialect: str) -> str:
    """Render the per-document narrative text expression.

    Input columns: ``doc_id`` (bigint), ``text`` (string).
    Output: one string — space-joined templated sentences.
    """
    if dialect == "spark":
        split = "split(text, ' ')"
        seq = "sequence(0, n_sent - 1)"
        xform = "transform"
        length_fn = "size"

        def el(k: str) -> str:
            return f"try_element_at(toks, cast({k} as int))"

        cities = "array(" + ", ".join(f"'{c}'" for c in CITIES) + ")"

        def city_el(k: str) -> str:
            return f"try_element_at(cities, cast({k} as int))"

    elif dialect == "duckdb":
        split = "str_split(text, ' ')"
        seq = "range(0, n_sent)"
        xform = "list_transform"
        length_fn = "len"

        def el(k: str) -> str:
            return f"list_extract(toks, cast({k} as int))"

        cities = "[" + ", ".join(f"'{c}'" for c in CITIES) + "]"

        def city_el(k: str) -> str:
            return f"list_extract({cities}, cast({k} as int))"

    else:  # pragma: no cover
        raise ValueError(dialect)

    def cap(x: str) -> str:
        return f"(upper(substr({x}, 1, 1)) || substr({x}, 2))"

    t1, t2, t3 = el("3*i + 1"), el("3*i + 2"), el("3*i + 3")
    person = f"({cap(t1)} || ' ' || {cap(t2)})"
    org = f"({cap(t3)} || ' Corporation')"
    org2 = f"({cap(t2)} || ' Systems')"
    loc = city_el(f"((length({t1}) + i) % 8) + 1")
    tech = f"({cap(t1)} || 'ware')"

    sentence = f"""
        CASE
          WHEN i % 4 = 3 THEN ('the ' || {t1} || ' ' || {t2} || ' pipeline ran quickly.')
          ELSE CASE (doc_id + i) % 10
            WHEN 0 THEN ({person} || ' is the CEO of ' || {org} || '.')
            WHEN 1 THEN ({person} || ' works at ' || {org} || '.')
            WHEN 2 THEN ({person} || ' founded ' || {org} || ' in ' || {loc} || '.')
            WHEN 3 THEN ({org} || ' acquired ' || {org2} || '.')
            WHEN 4 THEN ({person} || ' manages the ' || {org} || '.')
            WHEN 5 THEN ({org} || ' is located in ' || {loc} || '.')
            WHEN 6 THEN ({org} || ' developed ' || {tech} || '.')
            WHEN 7 THEN ({tech} || ' is used by ' || {org} || '.')
            WHEN 8 THEN ({person} || ' is the CTO of ' || {org} || '.')
            ELSE ({person} || ' now serves as president of ' || {org} || '.')
          END
        END
    """.strip()

    # rows with n_sent = 0 are filtered before this expression is applied
    if dialect == "spark":
        return f"concat_ws(' ', {xform}({seq}, i -> {sentence}))"
    return f"array_to_string({xform}({seq}, i -> {sentence}), ' ')"


def narrative_documents(documents: DataFrame) -> DataFrame:
    """(doc_id bigint, text, ...) → (doc_id bigint, text string) narrative."""
    base = documents.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("toks"),
        F.expr("cast(floor(size(split(text, ' ')) / 3) as int)").alias("n_sent"),
        F.expr("array(" + ", ".join(f"'{c}'" for c in CITIES) + ")").alias("cities"),
    )
    narr = base.where(F.col("n_sent") > 0).select(
        "doc_id", F.expr(_render("spark")).alias("text")
    )
    return narr


def replicate(documents: DataFrame, factor: int) -> DataFrame:
    """Deterministically replicate (doc_id, text) rows ``factor``× for
    throughput benchmarking: new ids remain unique and shift the template
    phase, so replicas are distinct-but-equivalent workloads.  Pure flatMap
    shape (explode of a literal sequence) — no shuffle, no RNG."""
    return documents.select(
        F.explode(F.expr(f"sequence(0, {int(factor)} - 1)")).alias("rep"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
        "text",
    )


def heavy_tail(documents: DataFrame, tail_fraction_mod: int = 10, blowup: int = 10) -> DataFrame:
    """Skew-exercise variant (FIXTURES.md §4): every ``tail_fraction_mod``-th
    document's text is repeated ``blowup``× — a deterministic heavy-tail
    length distribution that stresses partition balance exactly like hot web
    domains do at corpus scale."""
    rep = F.expr(
        f"CASE WHEN doc_id % {tail_fraction_mod} = 0 "
        f"THEN array_join(array_repeat(text, {blowup}), ' ') ELSE text END"
    )
    return documents.select("doc_id", rep.alias("text"))


#: DuckDB CTE producing the identical (doc_id, text) — prefix for oracle SQL.
NARRATIVE_CTE = """
narrative AS (
    SELECT doc_id, {expr} AS text
    FROM (
        SELECT doc_id,
               str_split(text, ' ') AS toks,
               CAST(floor(len(str_split(text, ' ')) / 3) AS INT) AS n_sent
        FROM documents
    )
    WHERE n_sent > 0
)
""".strip().format(expr=_render("duckdb"))
