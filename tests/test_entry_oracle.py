"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.001 and compare against oracle_sql() in DuckDB — row count, column
names, order-insensitive values, AND pandas dtype kinds. The dtype check
replicates the driver's value-hash, which is type-sensitive: DuckDB
``sum(BIGINT)`` returns HUGEINT and lands in pandas as float64, hashing
114.0 != Spark's int64 114 even when values are equal (round-5 red row
``session_usage_counts``). Oracles must CAST aggregates back to BIGINT."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.execute(sql)


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.9g}"
    return str(value)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_normalize(r[i]) for i in order) for r in rows)


ORACLE_KEYS = sorted(entry_mod.oracle_sql())


def _dtype_kinds(pdf):
    """Map each column to its pandas dtype 'kind' (i=int, f=float, b=bool,
    M=datetime, O=object). int32 vs int64 is fine; int vs float is the
    drift the driver's hash trips on."""
    return {c: pdf[c].dtype.kind for c in pdf.columns}


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = _duck(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert _rowset(spark_cols, spark_rows) == _rowset(duck_cols, duck_rows)

    # Dtype-strict leg: the driver hashes values through pandas, where a
    # DuckDB HUGEINT/DOUBLE aggregate != a Spark BIGINT even at equal values.
    spark_pdf = sdf.toPandas()
    duck_pdf = _duck(entry_mod.oracle_sql()[name]).fetch_df()
    sk, dk = _dtype_kinds(spark_pdf), _dtype_kinds(duck_pdf)
    mismatched = {
        c: (sk[c], dk[c])
        for c in sk
        # Empty/all-null columns degrade to object/float in pandas on one
        # side only; kind comparison is meaningless there.
        if sk[c] != dk[c]
        and spark_pdf[c].notna().any()
        and duck_pdf[c].notna().any()
    }
    assert not mismatched, f"dtype drift (spark_kind, duck_kind): {mismatched}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["entity_name", "entity_id", "mention_count"]


def test_rows_only_queries_run(spark):
    for name in ("kg_triples", "kg_edge_type_histogram", "kg_nodes", "simhash_signatures"):
        df = entry_mod.queries()[name](spark, SF_DIR)
        assert df.count() > 0, name
