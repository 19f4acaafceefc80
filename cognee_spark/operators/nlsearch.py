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

# 'set' is deliberately NOT here: the head-keyword check already blocks a
# SET statement, and \bset\b false-positives legitimate SELECTs that merely
# contain the word (e.g. a column named result_set).
_FORBIDDEN = re.compile(
    r"\b(insert|update|delete|drop|create|alter|truncate|merge|grant)\b", re.I
)
_TARGETS = re.compile(r"\b(?:from|join)\s+([A-Za-z_][\w.]*)", re.I)


class QueryRejected(ValueError):
    pass


def _normalize_sql(sql: str) -> str:
    """Single-pass lexer that blanks string literals (to ``lit``) and strips
    comments with REAL SQL lexing rules — comment markers inside strings
    don't count, quotes inside comments don't count, bracketed comments nest
    (Spark's lexer nests them too). Regex substitution cannot get this
    ordering right: a quote inside a comment re-pairs around live SQL and
    hides it from target extraction (the round-3 ADVICE bypass). Unterminated
    strings/comments are rejected rather than guessed at."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", '"'):  # string literal — Spark lexes "..." as a string
            # too (double-quoted identifiers are off by default), so BOTH
            # delimiters must be blanked: a single quote inside "..." would
            # otherwise re-pair around live SQL and hide it from validation
            quote = ch
            i += 1
            while i < n:
                if sql[i] == "\\" and i + 1 < n:  # backslash escape
                    i += 2
                elif sql[i] == quote:
                    if i + 1 < n and sql[i + 1] == quote:  # doubled-quote escape
                        i += 2
                    else:
                        break
                else:
                    i += 1
            if i >= n:
                raise QueryRejected("unterminated string literal")
            out.append(" lit ")
            i += 1
        elif ch == "-" and sql.startswith("--", i):  # line comment
            while i < n and sql[i] != "\n":
                i += 1
            out.append(" ")
        elif ch == "/" and sql.startswith("/*", i):  # bracketed comment (nests)
            depth, i = 1, i + 2
            while i < n and depth:
                if sql.startswith("/*", i):
                    depth, i = depth + 1, i + 2
                elif sql.startswith("*/", i):
                    depth, i = depth - 1, i + 2
                else:
                    i += 1
            if depth:
                raise QueryRejected("unterminated comment")
            out.append(" ")
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def schema_description(tables: dict[str, DataFrame]) -> str:
    return "\n".join(
        f"  {name}({', '.join(f'{f.name}:{f.dataType.simpleString()}' for f in df.schema.fields)})"
        for name, df in sorted(tables.items())
    )


def validate_generated_sql(sql: str, allowed_views: set[str]) -> None:
    """Guardrails on a generated query (the safety layer the reference's
    graph_engine.query trustingly lacks): one read-only statement over the
    registered views only.

    Target extraction runs on a NORMALIZED text produced by a one-pass SQL
    lexer (_normalize_sql): string literals are blanked (quoted text can
    neither hide nor fake a relation) and comments stripped with correct
    lexing precedence (``FROM/**/other_table`` is still captured as a
    target; a quote inside a comment cannot re-pair around live SQL).
    Backtick-quoted identifiers are rejected outright — the registered
    ``kg_*`` views never need quoting, and allowing backticks would let
    ``FROM `other_table``` slip past the identifier regex."""
    stripped = sql.strip().rstrip(";").strip()
    if "`" in stripped:
        raise QueryRejected("backtick-quoted identifiers are not allowed")
    normalized = _normalize_sql(stripped)
    if ";" in normalized:
        raise QueryRejected("multiple statements are not allowed")
    head = normalized.split(None, 1)[0].lower() if normalized.strip() else ""
    if head not in ("select", "with"):
        raise QueryRejected("only SELECT/WITH queries are allowed")
    if _FORBIDDEN.search(normalized):
        raise QueryRejected("mutating keywords are not allowed")
    ctes = {m.group(1).lower() for m in re.finditer(r"\b([A-Za-z_]\w*)\s+as\s*\(", normalized, re.I)}
    for m in _TARGETS.finditer(normalized):
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
