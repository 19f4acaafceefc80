"""Event-log folding in tools/attribute_stages.py — pure-Python, no Spark.

Pins the two report-integrity rules: (a) each application log file owns its
job-id keyspace and marker (job ids restart at 0 per app, so a shared
keyspace would collide across files), (b) tasks whose stage has no JobStart
stay visible under '?' instead of being silently dropped by the marker
exclusion."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from attribute_stages import attribute  # noqa: E402


def _job_start(jid, stage_ids, desc=None):
    ev = {"Event": "SparkListenerJobStart", "Job ID": jid, "Stage IDs": stage_ids}
    if desc is not None:
        ev["Properties"] = {"spark.job.description": desc}
    return ev


def _task_end(stage_id, run_ms=1000):
    return {
        "Event": "SparkListenerTaskEnd",
        "Stage ID": stage_id,
        "Task Metrics": {"Executor Run Time": run_ms, "Executor CPU Time": run_ms * 1e6},
    }


def _write_log(path, events):
    path.write_text("\n".join(json.dumps(e) for e in events) + "\n")


def test_marker_excludes_only_its_own_files_jobs(tmp_path):
    # app 1: warm-up job 0 (stage 0), marker job 1, measured job 2 (stage 2)
    _write_log(
        tmp_path / "app-1",
        [
            _job_start(0, [0], "stage:nodes"),
            _task_end(0, run_ms=5000),  # warm-up — must be excluded
            _job_start(1, [1], "attrib:marker"),
            _task_end(1, run_ms=1),
            _job_start(2, [2], "stage:nodes"),
            _task_end(2, run_ms=2000),
        ],
    )
    agg = attribute(str(tmp_path))
    assert agg["stage:nodes"]["tasks"] == 1  # warm-up job 0 dropped
    assert abs(agg["stage:nodes"]["run_s"] - 2.0) < 1e-9


def test_multi_app_job_ids_do_not_collide(tmp_path):
    # app 1's marker is job 5; app 2 restarts at job 0 — its early jobs must
    # NOT be swallowed by app 1's marker id
    _write_log(
        tmp_path / "app-1",
        [
            _job_start(5, [50], "attrib:marker"),
            _job_start(6, [60], "stage:edges"),
            _task_end(60, run_ms=1000),
        ],
    )
    _write_log(
        tmp_path / "app-2",
        [
            _job_start(0, [0], "stage:triples"),
            _task_end(0, run_ms=3000),
        ],
    )
    agg = attribute(str(tmp_path))
    assert agg["stage:edges"]["tasks"] == 1
    # marker-less app-2: aggregated in full, not excluded by app-1's marker=5
    assert agg["stage:triples"]["tasks"] == 1
    assert abs(agg["stage:triples"]["run_s"] - 3.0) < 1e-9


def test_orphan_stage_tasks_land_under_question_mark(tmp_path):
    # a TaskEnd whose stage has no JobStart must stay visible under '?'
    _write_log(
        tmp_path / "app-1",
        [
            _job_start(0, [0], "attrib:marker"),
            _task_end(0, run_ms=1),
            _task_end(99, run_ms=4000),  # stage 99 never announced
        ],
    )
    agg = attribute(str(tmp_path))
    assert agg["?"]["tasks"] == 1
    assert abs(agg["?"]["run_s"] - 4.0) < 1e-9
