"""Capture .explain('formatted') output for the round-7 optimization targets.

Usage: python tools/capture_plans.py <suffix>
Writes plans/r07/<name>_<suffix>.txt for each target query plus the pipeline
frames the round touches (contains/structural edges, document dedup). The
bench session settings (local[$SPARK_GRAFT_CPUS], shuffle=cpus) are used so
the captured plans match what bench.py executes.
"""
from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r07"
    out_dir.mkdir(parents=True, exist_ok=True)

    from cognee_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        app_name="capture_plans_r07", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    def dump(name: str, df) -> None:
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(text)
        print(f"wrote {name}_{suffix}.txt")

    # declared queries this round touches
    for name in (
        "kg_triplet_topk",
        "khop_words",
        "skill_run_graph",
        "feedback_weights",
    ):
        dump(name, entry.queries()[name](spark, sf_dir))

    # pipeline frames (not queries() entries, but the spine operators the
    # round optimizes): materialize stage inputs over a small synthetic corpus
    from cognee_spark.operators.materialize import (
        build_contains_edges,
        build_structural_edges,
    )
    from cognee_spark.pipeline import run_pipeline
    from cognee_spark.sources.corpus import build_repos_df

    root = tempfile.mkdtemp(prefix="capture_plans_kg")
    repos = build_repos_df(spark, 210)
    tables = run_pipeline(
        spark, repos, root, "plans:210", compute_metrics=False,
        with_summaries=False, with_index=False,
    )["tables"]
    dump("pipeline_contains_edges", build_contains_edges(tables["mentions"]))
    dump("pipeline_structural_edges", build_structural_edges(tables["mentions"]))
    spark.stop()


if __name__ == "__main__":
    main()
