"""Natural-language / generated-query search (natural_language_retriever.py
semantics): schema-prompted generation, guarded execution, retry with
failure feedback."""

from __future__ import annotations

import pytest

from cognee_spark.operators.nlsearch import (
    QueryRejected,
    natural_language_search,
    template_sql_generator,
    validate_generated_sql,
)


@pytest.fixture()
def graph(spark):
    nodes = spark.createDataFrame(
        [("n1", "a", "function"), ("n2", "b", "function"), ("n3", "c", "module")],
        ["entity_id", "name", "kind"],
    )
    triples = spark.createDataFrame(
        [("a", "uses", "b"), ("a", "calls", "c")], ["subj", "pred", "obj"]
    )
    return {"nodes": nodes, "triples": triples}


def test_guardrails():
    allowed = {"kg_nodes", "kg_triples"}
    validate_generated_sql("SELECT * FROM kg_nodes", allowed)
    validate_generated_sql(
        "WITH t AS (SELECT * FROM kg_triples) SELECT * FROM t", allowed
    )
    with pytest.raises(QueryRejected):
        validate_generated_sql("DROP TABLE kg_nodes", allowed)
    with pytest.raises(QueryRejected):
        validate_generated_sql("SELECT * FROM other_table", allowed)
    with pytest.raises(QueryRejected):
        validate_generated_sql("SELECT 1; SELECT 2", allowed)
    with pytest.raises(QueryRejected):
        validate_generated_sql("SELECT * FROM kg_nodes WHERE kind = (DELETE)", allowed)


def test_guardrails_comment_and_backtick_bypasses_closed():
    """The round-3 ADVICE holes: backtick-quoted relations and comment-hidden
    targets must not slip past target extraction, and the word 'set' inside a
    legitimate SELECT must not false-positive."""
    allowed = {"kg_nodes", "kg_triples"}
    # backtick-quoted relation escaped the bare-identifier regex
    with pytest.raises(QueryRejected):
        validate_generated_sql("SELECT * FROM `other_table`", allowed)
    with pytest.raises(QueryRejected):
        validate_generated_sql("SELECT * FROM `kg_nodes`", allowed)  # no backticks at all
    # block comment between FROM and the target hid it from extraction
    with pytest.raises(QueryRejected):
        validate_generated_sql("SELECT * FROM/**/other_table", allowed)
    with pytest.raises(QueryRejected):
        validate_generated_sql("SELECT * FROM /* x */ other_table", allowed)
    # comments around an ALLOWED target still validate
    validate_generated_sql("SELECT * FROM /* the graph */ kg_nodes", allowed)
    validate_generated_sql("SELECT * FROM kg_nodes -- trailing note", allowed)
    # a quote inside a comment could re-pair around live SQL — rejected
    with pytest.raises(QueryRejected):
        validate_generated_sql(
            "SELECT a FROM kg_nodes /* ' */ UNION SELECT * FROM secret /* ' */",
            allowed,
        )
    # 'set' as a plain word is legitimate (head check still blocks SET stmts)
    validate_generated_sql("SELECT result_set FROM kg_nodes", allowed)
    validate_generated_sql("SELECT * FROM kg_nodes WHERE name = 'set'", allowed)
    with pytest.raises(QueryRejected):
        validate_generated_sql("SET spark.x = 1", allowed)


def test_guardrails_double_quote_bypass_closed():
    """Round-4 ADVICE: Spark lexes "..." as a string literal by default, so a
    single quote inside double quotes re-paired around live SQL and hid a
    join against an unregistered table from target extraction."""
    allowed = {"kg_nodes", "kg_triples"}
    # the verified bypass from the advice, verbatim — must now be rejected
    with pytest.raises(QueryRejected):
        validate_generated_sql(
            "SELECT \"a'\" , * FROM secret_table JOIN kg_nodes ON true"
            " WHERE kg_nodes.name = \"'\"",
            allowed,
        )
    # legitimate double-quoted strings still validate (blanked, not rejected)
    validate_generated_sql('SELECT * FROM kg_nodes WHERE name = "zephyr"', allowed)
    # "" doubled-quote escape inside a double-quoted literal
    validate_generated_sql('SELECT * FROM kg_nodes WHERE name = "a""b"', allowed)
    # a relation name smuggled INSIDE a double-quoted string is just a string
    validate_generated_sql(
        'SELECT * FROM kg_nodes WHERE name = "FROM secret_table"', allowed
    )
    with pytest.raises(QueryRejected):
        validate_generated_sql('SELECT "unterminated FROM kg_nodes', allowed)


def test_generated_query_answers_question(spark, graph):
    out = natural_language_search(
        spark, graph, "how many function nodes", template_sql_generator()
    )
    assert out.first().n == 2
    out = natural_language_search(
        spark, graph, "what does a uses?", template_sql_generator()
    )
    assert [r.obj for r in out.collect()] == ["b"]


def test_retry_feeds_failure_back_into_prompt(spark, graph):
    """Attempt 1 generates invalid SQL; the retry prompt must carry the
    failed query + error, and attempt 2 succeeds (reference
    previous_attempts flow)."""
    prompts = []

    def flaky_llm(prompt):
        prompts.append(prompt)
        if len(prompts) == 1:
            return "SELECT nonexistent_column FROM kg_nodes"
        return "SELECT count(*) AS n FROM kg_nodes"

    out = natural_language_search(spark, graph, "how many nodes?", flaky_llm)
    assert out.first().n == 3
    assert "No attempts yet" in prompts[0]
    assert "nonexistent_column" in prompts[1] and "error" in prompts[1]


def test_all_attempts_failing_raises(spark, graph):
    with pytest.raises(QueryRejected):
        natural_language_search(
            spark, graph, "q", lambda p: "DROP TABLE kg_nodes", max_attempts=2
        )
