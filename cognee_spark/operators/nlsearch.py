"""Natural-language / generated-query search — the reference's
NaturalLanguageRetriever + CypherSearchRetriever
(cognee/modules/retrieval/natural_language_retriever.py:35-110,
cypher_search_retriever.py): introspect the graph schema, have an LLM
generate a query, execute it against the graph store, and retry up to
``max_attempts`` times feeding each failure (parse error, guardrail
rejection, empty result) back into the prompt.

Spark re-expression: the graph lives in DataFrames, so the generated query
language is Spark SQL over registered ``kg_*`` views instead of Cypher —
same control flow, same seams:

- schema introspection = the views' own schemas (no separate catalog query)
- the LLM call is a pluggable ``llm(prompt) -> sql`` callable
- execution is guarded: single SELECT/WITH statement, no DDL/DML keywords,
  FROM/JOIN targets restricted to the registered views — a generated query
  can read the graph, never mutate anything
- failed attempts are summarized into the next prompt exactly like the
  reference's ``previous_attempts`` context
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

NL_SQL_PROMPT_TEMPLATE = (
    "You translate questions into a single Spark SQL SELECT statement.\n"
    "Available views:\n{schema}\n"
    "Only SELECT (or WITH...SELECT) over these views is allowed.\n"
    "Previous attempts: {previous_attempts}\n"
    "Question: `{question}`"
)

_FORBIDDEN = re.compile(
    r"\b(insert|update|delete|drop|create|alter|truncate|merge|grant|set)\b", re.I
)
_TARGETS = re.compile(r"\b(?:from|join)\s+([A-Za-z_][\w.]*)", re.I)


class QueryRejected(ValueError):
    pass


def schema_description(tables: dict[str, DataFrame]) -> str:
    return "\n".join(
        f"  {name}({', '.join(f'{f.name}:{f.dataType.simpleString()}' for f in df.schema.fields)})"
        for name, df in sorted(tables.items())
    )


def validate_generated_sql(sql: str, allowed_views: set[str]) -> None:
    """Guardrails on a generated query (the safety layer the reference's
    graph_engine.query trustingly lacks): one read-only statement over the
    registered views only."""
    stripped = sql.strip().rstrip(";").strip()
    if ";" in stripped:
        raise QueryRejected("multiple statements are not allowed")
    head = stripped.split(None, 1)[0].lower() if stripped else ""
    if head not in ("select", "with"):
        raise QueryRejected("only SELECT/WITH queries are allowed")
    if _FORBIDDEN.search(stripped):
        raise QueryRejected("mutating keywords are not allowed")
    # strip quoted strings so literals can't false-positive as targets
    unquoted = re.sub(r"'[^']*'", "''", stripped)
    ctes = {m.group(1).lower() for m in re.finditer(r"\b([A-Za-z_]\w*)\s+as\s*\(", unquoted, re.I)}
    for m in _TARGETS.finditer(unquoted):
        target = m.group(1).lower()
        if target not in allowed_views and target not in ctes and target != "(":
            raise QueryRejected(f"unknown relation {target!r}")


def natural_language_search(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    question: str,
    llm: Callable[[str], str],
    max_attempts: int = 3,
    view_prefix: str = "kg_",
) -> DataFrame:
    """question → generated Spark SQL → guarded execution → DataFrame.

    Retries with failure feedback (natural_language_retriever.py:70-110
    semantics: each attempt's query + error is appended to the prompt; an
    empty result also counts as a failed attempt). Raises the last error if
    no attempt succeeds.
    """
    views: dict[str, DataFrame] = {}
    for name, df in tables.items():
        view_name = f"{view_prefix}{name}"
        df.createOrReplaceTempView(view_name)
        views[view_name] = df
    allowed = set(views)
    schema = schema_description(views)

    previous_attempts = "No attempts yet"
    last_error: Exception | None = None
    for _ in range(max_attempts):
        prompt = NL_SQL_PROMPT_TEMPLATE.format(
            schema=schema, previous_attempts=previous_attempts, question=question
        )
        sql = llm(prompt)
        try:
            validate_generated_sql(sql, allowed)
            result = spark.sql(sql.strip().rstrip(";"))
            if not result.take(1):
                raise QueryRejected("query returned no results")
            return result
        except Exception as err:  # parse error, guardrail, empty result
            last_error = err
            previous_attempts = f"{previous_attempts}\n- query: {sql!r} error: {err}"
    raise last_error


def template_sql_generator(view_prefix: str = "kg_") -> Callable[[str], str]:
    """Deterministic serving double for the LLM seam: pattern-matches the two
    question shapes the tests/demos use. Production swaps a real model behind
    the same ``llm(prompt) -> sql`` signature."""

    def generate(prompt: str) -> str:
        question = prompt.rsplit("Question: `", 1)[-1].rstrip("`")
        m = re.match(r"how many (\w+) nodes", question, re.I)
        if m:
            return (
                f"SELECT count(*) AS n FROM {view_prefix}nodes"
                f" WHERE kind = '{m.group(1)}'"
            )
        m = re.match(r"what does (\S+) (\w+)\??$", question, re.I)
        if m:
            return (
                f"SELECT obj FROM {view_prefix}triples"
                f" WHERE subj = '{m.group(1)}' AND pred = '{m.group(2)}'"
            )
        return f"SELECT subj, pred, obj FROM {view_prefix}triples LIMIT 10"

    return generate
