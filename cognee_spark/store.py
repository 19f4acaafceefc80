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

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


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


def _count_part_files(path: str) -> int:
    """Partition/file count of a committed table from the directory listing —
    a metadata walk, never a Spark job (rdd.getNumPartitions() on a fresh
    parquet read costs a full file-listing + split-planning pass)."""
    n = 0
    for _dir, _subdirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


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

    The row count rides on the WRITE job via ``DataFrame.observe`` — no
    read-back scan. Round 1 measured the per-stage count()+getNumPartitions
    read-backs as a serial floor that capped N→4N scaling efficiency; the
    observation metric is aggregated by the same tasks that write the files,
    so the commit costs exactly one job. ``count_rows=False`` additionally
    skips the observation for LEAF tables nothing reads back.
    """
    if not force and store.is_complete(stage, signature) and store.exists(stage):
        return store.read(spark, stage)
    started = time.time()
    # thread-local job description → Spark UI / event-log attribution of
    # every job this stage submits (works under concurrent stage submission)
    spark.sparkContext.setLocalProperty("spark.job.description", f"stage:{stage}")
    df = build()
    metrics: dict = {}
    if count_rows:
        obs = Observation(f"rows_{stage}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    store.write(df, stage, partition_by=partition_by)
    metrics["wall_sec"] = round(time.time() - started, 3)
    if count_rows:
        metrics["rows"] = obs.get["rows"]
        metrics["partitions"] = _count_part_files(store.path(stage))
    store.checkpoint(stage, signature, **metrics)
    # read back WITH the build schema: an empty stage output (legitimate for
    # e.g. a pure-relational corpus with nothing to extract) writes no data
    # files, and a schema-less parquet read would fail to infer
    return spark.read.schema(df.schema).parquet(store.path(stage))
