"""Schema-snapshot ingest (sources/relational.ingest_database_schema) and
Graphiti re-index (operators/indexing.reindex_graphiti_objects) vs the
reference's cognee/tasks/schema/ingest_database_schema.py and
cognee/tasks/temporal_awareness/index_graphiti_objects.py."""

from __future__ import annotations

import json
import uuid
from uuid import NAMESPACE_OID

from pyspark.sql import functions as F

from cognee_spark.operators.indexing import reindex_graphiti_objects
from cognee_spark.sources.relational import ingest_database_schema


def _snapshot(spark):
    users = spark.createDataFrame(
        [(1, "ada", 10), (2, "bob", 10), (3, "cyd", 20)],
        "user_id int, name string, org_id int",
    )
    orgs = spark.createDataFrame([(10, "acme"), (20, "zeta")], "org_id int, org string")
    schema = {
        "users": {
            "columns": {"user_id": "int", "name": "string", "org_id": "int"},
            "primary_key": "user_id",
            "foreign_keys": [
                {"column": "org_id", "ref_table": "orgs", "ref_column": "org_id"}
            ],
        },
        "orgs": {
            "columns": {"org_id": "int", "org": "string"},
            "primary_key": "org_id",
            "foreign_keys": [],
        },
    }
    return schema, {"users": users, "orgs": orgs}


def test_schema_ingest_builds_reference_datapoints(spark):
    schema, tables = _snapshot(spark)
    out = ingest_database_schema(
        spark, schema, tables, db_name="crm", db_provider="spark",
        max_sample_rows=2,
    )
    t = {r.name: r for r in out["schema_tables"].collect()}
    assert set(t) == {"users", "orgs"}
    # ids mirror ingest_database_schema.py:82 — uuid5(OID, table_name), raw
    assert t["users"].node_id == str(uuid.uuid5(NAMESPACE_OID, "users"))
    assert t["users"].row_count_estimate == 3 and t["orgs"].row_count_estimate == 2
    assert t["users"].primary_key == "user_id"
    assert json.loads(t["users"].columns) == schema["users"]["columns"]
    assert len(json.loads(t["users"].sample_rows)) == 2  # bounded sampling

    rels = out["relationships"].collect()
    assert len(rels) == 1
    r = rels[0]
    # :104-106 — relationship name + uuid5 of it
    assert r.name == "users:org_id->orgs:org_id"
    assert r.node_id == str(uuid.uuid5(NAMESPACE_OID, r.name))
    assert (r.source_table, r.target_table) == ("users", "orgs")
    assert r.relationship_type == "foreign_key"

    db = out["database_schema"].first()
    assert db.node_id == str(uuid.uuid5(NAMESPACE_OID, "spark:crm"))  # :119
    assert db.database_type == "spark"


def test_schema_ingest_qualifies_unqualified_ref_tables(spark):
    # :99-101 — an unqualified ref_table inherits the referencing table's
    # schema part
    schema = {
        "sales.orders": {
            "columns": {"id": "int", "cust": "int"},
            "primary_key": "id",
            "foreign_keys": [
                {"column": "cust", "ref_table": "customers", "ref_column": "id"}
            ],
        },
    }
    out = ingest_database_schema(spark, schema)
    r = out["relationships"].first()
    assert r.target_table == "sales.customers"
    t = out["schema_tables"].first()
    assert t.row_count_estimate == 0  # no table frame → no estimate


def _graphiti(spark):
    nodes = spark.createDataFrame(
        [
            ("u1", None, "Ada", "ada summary", "ada content"),
            ("u2", None, "Bob", None, "bob content"),
            ("u3", None, None, None, None),
        ],
        "uuid string, id string, name string, summary string, content string",
    )
    edges = spark.createDataFrame(
        [("u1", "u2", "KNOWS"), ("u2", "u3", "KNOWS"), ("u1", "u3", "WORKS_WITH")],
        "source string, target string, type string",
    )
    return nodes, edges


def test_graphiti_reindex_normalizes_and_indexes_per_field(spark):
    nodes, edges = _graphiti(spark)
    out = reindex_graphiti_objects(nodes, edges)
    # node.id := uuid, text := coalesce(summary, content) (the Cypher
    # normalize passes, index_graphiti_objects.py:33-42)
    n = {r.id: r for r in out["nodes"].collect()}
    assert set(n) == {"u1", "u2", "u3"}
    assert n["u1"].text == "ada summary" and n["u2"].text == "bob content"
    assert n["u3"].text is None
    # edges get source_node_id/target_node_id/relationship_name := type(r)
    e = out["edges"].first()
    assert {"source_node_id", "target_node_id", "relationship_name"} <= set(
        out["edges"].columns
    )
    # only non-null fields index (:63-66); u3 indexes nothing
    pts = {(r.collection, r.item_id): r.text for r in out["index"].collect()}
    assert ("GraphitiNode_name", "u1") in pts and ("GraphitiNode_name", "u2") in pts
    assert ("GraphitiNode_summary", "u2") not in pts
    assert not any(k[1] == "u3" for k in pts if k[0].startswith("GraphitiNode"))
    # EdgeType counter (:77-81): one point per relationship name
    et = {r.relationship_name: r.number_of_edges for r in out["edge_types"].collect()}
    assert et == {"KNOWS": 2, "WORKS_WITH": 1}
    assert sum(1 for k in pts if k[0] == "EdgeType_relationship_name") == 2
    # index rows carry embeddings in the engine's committed-index shape
    assert "embedding" in out["index"].columns


def test_graphiti_reindex_accepts_relationship_name_column(spark):
    nodes, _ = _graphiti(spark)
    edges = spark.createDataFrame(
        [("u1", "u2", "LIKES")],
        "source string, target string, relationship_name string",
    )
    out = reindex_graphiti_objects(nodes, edges)
    assert out["edges"].first().relationship_name == "LIKES"
