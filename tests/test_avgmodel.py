"""Checkpoint selection + averaging semantics for inference
(cat/utils/avgmodel.py:20-111 best-N vs last-N — VERDICT round-1 weak
item 9: verify both modes of pipeline._load_decode_state)."""
import json
import os

import numpy as np
import pytest

from cat_tpu.utils.checkpoint import CheckpointManager
from cat_tpu.utils.manager import TrainState


def _state(v):
    return TrainState(params={"w": np.full((2, 2), float(v),
                                           np.float32)},
                      batch_stats={}, opt_state=(), step=np.asarray(v))


def make_ckpts(tmp_path, metrics):
    """Write one checkpoint per (step, metric); params = step value."""
    cm = CheckpointManager(str(tmp_path / "check"), keep_last=10,
                           keep_best=10)
    for step, metric in metrics:
        cm.save({"state": _state(step)}, metric, step, epoch=step)
    return cm


def load_decode(tmp_path, avg):
    from cat_tpu.pipeline.asr import _load_decode_state

    hyper = {"inference": {"avgmodel": avg}}
    params, _ = _load_decode_state(str(tmp_path), hyper)
    return float(np.mean(params["w"]))


@pytest.fixture()
def ckpts(tmp_path):
    # steps 1..5 with metrics (lower better): best = steps 4 (0.1) and
    # 2 (0.2); last two = steps 4, 5
    make_ckpts(tmp_path, [(1, 0.9), (2, 0.2), (3, 0.8), (4, 0.1),
                          (5, 0.7)])
    return tmp_path


def test_single_best_default(ckpts):
    # no avgmodel config -> single lowest-metric checkpoint (step 4)
    assert load_decode(ckpts, {}) == 4.0


def test_avg_best_n(ckpts):
    # best-2 by metric = steps {4, 2} -> mean param 3.0
    assert load_decode(ckpts, {"mode": "best", "num": 2}) == 3.0


def test_avg_last_n(ckpts):
    # last-2 by step = steps {4, 5} -> mean param 4.5
    assert load_decode(ckpts, {"mode": "last", "num": 2}) == 4.5


def test_avg_skips_pruned(tmp_path):
    """Pruned checkpoint files are excluded from selection."""
    cm = make_ckpts(tmp_path, [(1, 0.9), (2, 0.2), (3, 0.8), (4, 0.1),
                               (5, 0.7)])
    os.remove(cm.path(cm.entries[1][0]))  # delete step 2 (2nd best)
    # best-2 among remaining metrics {1:0.9, 3:0.8, 4:0.1, 5:0.7} =
    # steps {4, 5}
    assert load_decode(tmp_path, {"mode": "best", "num": 2}) == 4.5
