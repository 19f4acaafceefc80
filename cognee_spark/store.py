"""Checkpointed table store — the pipeline's persistence + resume layer.

Production target is Iceberg (MERGE INTO keyed by deterministic ids, snapshot
rollback, atomic commits — SURVEY §1.4/§2.8). This container has no Iceberg
runtime jars, so the same semantics are provided over parquet directories plus
a JSON checkpoint ledger:

- every stage writes its output table once, then records a checkpoint row
  (stage, input_signature, row count, wall seconds, partition count)
- on re-run, a stage whose (stage, input_signature) checkpoint exists is
  skipped and its table is read back — the reference's skip-completed
  semantics (run_tasks_data_item.py:86-103) at stage granularity
- a killed job resumes from the last committed stage because deterministic
  ids make every stage idempotent (SURVEY O1/O5)

The metrics ledger doubles as cognee's pipeline-run ledger
(run_tasks.py:81-89,176-185): one row per stage commit, written BEFORE the
next stage starts.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_checkpoints"), exist_ok=True)

    # --- tables -----------------------------------------------------------

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path(name), "_SUCCESS"))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def write(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(name))

    # --- checkpoints ------------------------------------------------------

    def _checkpoint_file(self, stage: str) -> str:
        return os.path.join(self.root, "_checkpoints", f"{stage}.json")

    def checkpoint(self, stage: str, signature: str, **metrics) -> None:
        payload = {"stage": stage, "signature": signature, "ts": time.time(), **metrics}
        tmp = self._checkpoint_file(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._checkpoint_file(stage))  # atomic commit

    def is_complete(self, stage: str, signature: str) -> bool:
        try:
            with open(self._checkpoint_file(stage)) as f:
                return json.load(f).get("signature") == signature
        except (FileNotFoundError, json.JSONDecodeError):
            return False

    def checkpoints(self) -> list[dict]:
        out = []
        folder = os.path.join(self.root, "_checkpoints")
        for fn in sorted(os.listdir(folder)):
            if fn.endswith(".json"):
                with open(os.path.join(folder, fn)) as f:
                    out.append(json.load(f))
        return out

    def invalidate(self, stage: str) -> None:
        try:
            os.remove(self._checkpoint_file(stage))
        except FileNotFoundError:
            pass


def run_stage(
    store: TableStore,
    spark: SparkSession,
    stage: str,
    signature: str,
    build,
    partition_by: list[str] | None = None,
    force: bool = False,
    count_rows: bool = True,
) -> DataFrame:
    """Execute one checkpointed stage: skip when committed, else build+commit.

    ``build`` is a thunk returning the stage's DataFrame; row count and wall
    time land in the checkpoint row (cognee's @task_summary analog,
    run_tasks_base.py:21-30). The returned frame always reads from the
    committed table (downstream consumers scan parquet, never recompute).

    ``count_rows=False`` is for LEAF tables nothing downstream consumes: the
    write is the commit; the extra count/partition jobs are pure fixed
    latency that caps scaling efficiency on small inputs.
    """
    if not force and store.is_complete(stage, signature) and store.exists(stage):
        return store.read(spark, stage)
    started = time.time()
    df = build()
    store.write(df, stage, partition_by=partition_by)
    out = store.read(spark, stage)
    metrics: dict = {"wall_sec": round(time.time() - started, 3)}
    if count_rows:
        metrics["rows"] = out.count()
        metrics["partitions"] = out.rdd.getNumPartitions()
    store.checkpoint(stage, signature, **metrics)
    return out
