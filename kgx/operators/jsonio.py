"""JSON graph parsing / coercion / validation (SURVEY §2.4 J1-J3, §2.2 P4).

The reference parses free-form LLM JSON into the fixed graph shape with a
multi-strategy parser (services.py:233-292), fills defaults
(``type='Entity'``, ``relationship='related_to'``, services.py:549-580) and
drops edges whose endpoints aren't in the node-id set (services.py:566-575).
Spark-side the whole family is declarative: ``from_json`` + higher-order
array functions — no UDF, fully codegen'd.

The reference's regex-based JSON *repair* chain (services.py:294-320) IS
replicated: :func:`repair_json_expr` renders the same regexp_replace cascade
(bare keys/values, trailing commas, prose prefix) in both Spark SQL and
DuckDB dialects, and the ``j2_json_repair`` gate query checks the two
engines against each other.  ``from_json``'s permissive mode additionally
plays the "best effort, null on failure" role for anything the cascade
can't fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAPH_JSON_SCHEMA = (
    "struct<nodes: array<struct<id:string, label:string, type:string>>, "
    "edges: array<struct<source:string, target:string, relationship:string>>>"
)


def repair_json_expr(col: str, dialect: str = "spark") -> str:
    """J2: the reference's common-issue JSON repair (services.py:294-320) as
    a regexp_replace chain — trim to outermost braces, strip trailing
    commas, quote bare keys, quote bare string values.

    Rendered per engine: Spark SQL string literals treat ``\\`` as an escape
    (so regex backslashes are doubled) and use ``$1`` backreferences; DuckDB
    literals are escape-free, uses ``\\1``, and needs the ``'g'`` flag.
    """
    spark = dialect == "spark"
    g1, g2 = ("$1", "$2") if spark else ("\\1", "\\2")

    def lit(rx: str) -> str:
        return rx.replace("\\", "\\\\") if spark else rx

    def rr(expr: str, pat: str, rep: str) -> str:
        flag = "" if spark else ", 'g'"
        return f"regexp_replace({expr}, '{lit(pat)}', '{rep}'{flag})"

    outer_rx = lit(r"(?s)\{.*\}")
    e = f"regexp_extract({col}, '{outer_rx}', 0)"
    e = rr(e, r",\s*\}", "}")
    e = rr(e, r",\s*\]", "]")
    e = rr(e, r"([\{,]\s*)(\w+):", f'{g1}"{g2}":')
    e = rr(e, r':\s*([^",\{\[\s][^,\}]*?)(\s*[,\}])', f': "{g1}"{g2}')
    return e


def parse_graph_json(df: DataFrame, json_col: str, out_col: str = "graph") -> DataFrame:
    """J1: parse a JSON graph document; malformed input → null struct."""
    return df.withColumn(out_col, F.from_json(F.col(json_col), GRAPH_JSON_SCHEMA))


def coerce_graph(df: DataFrame, graph_col: str = "graph") -> DataFrame:
    """J3 + P4: fill defaults, drop malformed nodes, keep only edges whose
    endpoints exist in the node-id set — all with array expressions."""
    g = graph_col
    nodes = (
        f"transform(filter(coalesce({g}.nodes, array()), "
        "n -> n.id IS NOT NULL AND n.label IS NOT NULL), "
        "n -> named_struct('id', n.id, 'label', n.label, "
        "'type', coalesce(n.type, 'Entity')))"
    )
    df = df.withColumn("nodes", F.expr(nodes))
    edges = (
        f"transform(filter(coalesce({g}.edges, array()), e -> "
        "e.source IS NOT NULL AND e.target IS NOT NULL "
        "AND exists(nodes, n -> n.id = e.source) "
        "AND exists(nodes, n -> n.id = e.target)), "
        "e -> named_struct('source', e.source, 'target', e.target, "
        "'relationship', coalesce(e.relationship, 'related_to')))"
    )
    return df.withColumn("edges", F.expr(edges))
