"""TableStore checkpoint ledger semantics (no Spark needed)."""

from __future__ import annotations

import json
import os

from cognee_spark.store import TableStore


def test_checkpoint_roundtrip(tmp_path):
    store = TableStore(str(tmp_path))
    assert not store.is_complete("stage_a", "sig1")
    store.checkpoint("stage_a", "sig1", rows=10, wall_sec=1.5)
    assert store.is_complete("stage_a", "sig1")
    assert not store.is_complete("stage_a", "sig2")  # signature mismatch
    rows = store.checkpoints()
    assert rows[0]["stage"] == "stage_a" and rows[0]["rows"] == 10
    store.invalidate("stage_a")
    assert not store.is_complete("stage_a", "sig1")
    store.invalidate("never_existed")  # no-op, no raise


def test_checkpoint_write_is_atomic(tmp_path):
    store = TableStore(str(tmp_path))
    store.checkpoint("s", "v1")
    # a torn/corrupt file must read as incomplete, not crash
    path = os.path.join(str(tmp_path), "_checkpoints", "s.json")
    with open(path, "w") as f:
        f.write('{"stage": "s", "sig')
    assert not store.is_complete("s", "v1")
    store.checkpoint("s", "v2")
    assert store.is_complete("s", "v2")
    with open(path) as f:
        assert json.load(f)["signature"] == "v2"


def test_exists_requires_success_marker(tmp_path):
    store = TableStore(str(tmp_path))
    os.makedirs(store.path("t"))
    assert not store.exists("t")
    open(os.path.join(store.path("t"), "_SUCCESS"), "w").close()
    assert store.exists("t")
