"""run_custom_pipeline (pipeline.py) vs the reference's custom-task
arrangement (modules/run_custom_pipeline/run_custom_pipeline.py:14-86):
task chaining, pipeline-cache skip, provenance stamping, named tasks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cognee_spark.pipeline import run_custom_pipeline


def _data(spark):
    return spark.createDataFrame(
        [("c1", "First sentence. More text."), ("c2", "plain words only")],
        "chunk_id string, text string",
    )


def test_chains_tasks_and_stamps_provenance(spark, tmp_path):
    calls = []

    def upper(df):
        calls.append("upper")
        return df.withColumn("text", F.upper("text"))

    def tag(df):
        calls.append("tag")
        return df.withColumn("n", F.length("text"))

    out = run_custom_pipeline(
        spark, [upper, tag], _data(spark), str(tmp_path / "s"), signature="v1"
    )
    rows = {r.chunk_id: r for r in out["result"].collect()}
    assert rows["c2"].text == "PLAIN WORDS ONLY" and rows["c2"].n == 16
    assert rows["c1"].source_pipeline == "custom_pipeline"
    assert rows["c1"].source_task == "01_tag"
    assert calls == ["upper", "tag"]
    assert set(out["tables"]) == {
        "custom_pipeline.00_upper", "custom_pipeline.01_tag"
    }
    assert len(out["metrics"]) == 2


def test_pipeline_cache_skips_and_reorder_recomputes(spark, tmp_path):
    calls = []

    def a(df):
        calls.append("a")
        return df

    def b(df):
        calls.append("b")
        return df

    root = str(tmp_path / "s")
    run_custom_pipeline(spark, [a, b], _data(spark), root, signature="v1")
    assert calls == ["a", "b"]
    # same chain + signature → cache hit, nothing rebuilds
    out = run_custom_pipeline(spark, [a, b], _data(spark), root, signature="v1")
    assert calls == ["a", "b"]
    assert out["result"].count() == 2
    # reordering the chain changes the pipeline id → recompute
    run_custom_pipeline(spark, [b, a], _data(spark), root, signature="v1")
    assert calls == ["a", "b", "b", "a"]
    # cache off → always re-execute (the reference's default)
    run_custom_pipeline(
        spark, [a, b], _data(spark), root, signature="v1",
        use_pipeline_cache=False,
    )
    assert calls == ["a", "b", "b", "a", "a", "b"]


def test_named_tasks_resolve_from_registry(spark, tmp_path):
    out = run_custom_pipeline(
        spark, ["summarize"], _data(spark), str(tmp_path / "s"), signature="v1"
    )
    got = {r.chunk_id: r.summary for r in out["result"].collect()}
    assert got["c1"] == "First sentence."
    with pytest.raises(ValueError, match="unknown kernel"):
        run_custom_pipeline(
            spark, ["nope"], _data(spark), str(tmp_path / "s2"), signature="v1"
        )
    with pytest.raises(ValueError, match="at least one task"):
        run_custom_pipeline(spark, [], _data(spark), str(tmp_path / "s3"))
