"""Plan inspection helpers — make the physical plan a testable artifact.

`.explain()` output is for humans; these helpers turn the executed plan into
data so tests (tests/test_plans.py) and tuning sessions can assert the
properties that matter at 100 TB: pushdown reached the scan, dictionary joins
broadcast, big joins don't, Python appears only where Arrow batches are
intended.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    read_schemas: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    broadcast_nested_loop_joins: int = 0
    exchanges: int = 0
    python_eval_nodes: int = 0
    arrow_eval_nodes: int = 0

    @property
    def python_free(self) -> bool:
        return self.python_eval_nodes == 0 and self.arrow_eval_nodes == 0


def plan_report(df: DataFrame) -> PlanReport:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return PlanReport(
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", plan),
        pushed_filters=[
            m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()
        ],
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        shuffled_hash_joins=plan.count("ShuffledHashJoin"),
        broadcast_nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        exchanges=plan.count("Exchange"),
        python_eval_nodes=plan.count("BatchEvalPython"),
        arrow_eval_nodes=plan.count("ArrowEvalPython") + plan.count("MapInPandas"),
    )


def explain_summary(df: DataFrame) -> str:
    """One-paragraph human summary of the plan's scale-relevant properties."""
    r = plan_report(df)
    joins = (
        f"{r.broadcast_hash_joins} broadcast-hash, {r.shuffled_hash_joins} shuffled-hash, "
        f"{r.sort_merge_joins} sort-merge, {r.broadcast_nested_loop_joins} broadcast-NL"
    )
    scans = "; ".join(r.read_schemas) or "none"
    return (
        f"scans: [{scans}] | pushed filters: {len(r.pushed_filters)} | joins: {joins} | "
        f"shuffles: {r.exchanges} | python nodes: {r.python_eval_nodes + r.arrow_eval_nodes}"
    )
