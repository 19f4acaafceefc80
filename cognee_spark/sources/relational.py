"""Relational (dlt-shaped) source — S6 of SURVEY.md §2.1.

The reference ingests dlt-loaded relational rows as DltRowDocument (one
chunk per row, cut_type 'dlt_row', NO LLM extraction —
DltRowDocument.py:9-47) and builds the graph deterministically from the
schema: SchemaTable nodes, SchemaRelationship nodes per foreign key, and
FK-based edges between the Document nodes of related rows
(extract_dlt_fk_edges.py:30-120).

Spark re-expression: a table is already the native shape, so "ingestion" is
a projection — each row renders to "col: val, col: val" text (the enriched
row context the reference stores), keyed by a deterministic document id.
FK edges are a join on the key columns, schema nodes a handful of literals;
all of it whole-stage codegen, no Python, no LLM. Row documents flow through
the standard pipeline (chunk_rows / C4 semantics); FK triples union into the
triples table shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_spark.functions.ids import id_for_col


def table_to_documents(
    df: DataFrame, table_name: str, key_col: str, columns: list[str] | None = None
) -> DataFrame:
    """Rows → repos-shaped documents: (repo, path, commit, lang, content).

    content = "col: val, col: val" in declared column order (the reference's
    schema-context text); path = <table>/<key>.row; lang = 'dlt' keeps the
    rows out of the code/NL extractors (their graph is schema-derived).
    """
    cols = columns or [c for c in df.columns]
    content = F.concat_ws(
        ", ", *[F.concat_ws(": ", F.lit(c), F.col(c).cast("string")) for c in cols]
    )
    return df.select(
        F.lit(f"db/{table_name}").alias("repo"),
        F.concat(F.lit(f"{table_name}/"), F.col(key_col).cast("string"), F.lit(".row")).alias("path"),
        F.lit("dlt").alias("commit"),
        F.lit("dlt").alias("lang"),
        content.alias("content"),
    )


def row_document_id(table_name: str, key: F.Column) -> F.Column:
    return F.concat(F.lit(f"db/{table_name}:{table_name}/"), key.cast("string"), F.lit(".row"))


def fk_row_edges(
    child: DataFrame,
    child_table: str,
    child_key: str,
    fk_col: str,
    parent: DataFrame,
    parent_table: str,
    parent_key: str,
) -> DataFrame:
    """FK-based (subj, pred, obj) edges between row documents
    (extract_dlt_fk_edges.py: FK edges between Document nodes of related
    rows). pred = references_<parent_table>. The join keys on the FK value —
    a plain equi-join Catalyst can broadcast or shuffle as sizes dictate."""
    c = child.select(
        row_document_id(child_table, F.col(child_key)).alias("subj"),
        F.col(fk_col).alias("_fk"),
    )
    p = parent.select(
        row_document_id(parent_table, F.col(parent_key)).alias("obj"),
        F.col(parent_key).alias("_pk"),
    )
    return (
        c.join(p, c["_fk"] == p["_pk"])
        .select(
            "subj",
            F.lit(f"references_{parent_table}").alias("pred"),
            "obj",
        )
    )


def schema_nodes(tables: list[str], fks: list[tuple[str, str, str, str]]) -> list[dict]:
    """SchemaTable + SchemaRelationship node rows (driver-side literals —
    a schema is dictionary-sized by definition). fks: (table, column,
    ref_table, ref_column)."""
    from cognee_spark.functions.ids import id_for_py

    rows = [
        {"node_id": id_for_py("SchemaTable", t), "kind": "SchemaTable", "name": t}
        for t in tables
    ]
    rows += [
        {
            "node_id": id_for_py("SchemaRelationship", f"{t}.{c}->{rt}.{rc}"),
            "kind": "SchemaRelationship",
            "name": f"{t}.{c}->{rt}.{rc}",
        }
        for t, c, rt, rc in fks
    ]
    return rows


def row_membership_edges(df: DataFrame, table_name: str, key_col: str) -> DataFrame:
    """row document → SchemaTable `is_part_of` edges."""
    return df.select(
        row_document_id(table_name, F.col(key_col)).alias("subj"),
        F.lit("is_part_of").alias("pred"),
        F.lit(table_name).alias("obj"),
    ).withColumn("obj_id", id_for_col("SchemaTable", F.col("obj")))
