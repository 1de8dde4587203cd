"""Mid-epoch resume: checkpoint at check_freq, resume, skip consumed
steps, end state matches uninterrupted run's step count."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.ctc import train as ctc_train
from cat_tpu.utils.checkpoint import CheckpointManager
from cat_tpu.utils.data import Batch
from cat_tpu.utils.manager import Manager
from cat_tpu.utils.scheduler import build_scheduler


class FixedLoader:
    """Deterministic loader of `n` batches per epoch."""

    def __init__(self, n, seed=0):
        rng = np.random.default_rng(seed)
        self.batches = []
        for i in range(n):
            feats = rng.standard_normal((4, 20, 4)).astype(np.float32)
            labels = rng.integers(1, 5, (4, 3)).astype(np.int32)
            self.batches.append(Batch(
                feats, np.full((4,), 20, np.int32), labels,
                np.full((4,), 3, np.int32),
                np.ones((4,), np.float32)))

    def epoch(self, i):
        yield from self.batches

    def __iter__(self):
        return self.epoch(0)


def make_mgr(tmp_path, name):
    model = ctc_train.build_model(
        {"encoder": {"type": "LSTM",
                     "kwargs": {"hdim": 8, "num_layers": 1,
                                "bidirectional": False,
                                "dropout_rate": 0.0}}}, num_classes=5)
    sched, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 1000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}}})
    state = ctc_train.init_state(model, tx, feat_dim=4)
    loader = FixedLoader(5)
    return Manager(
        train_step=ctc_train.make_train_step(model, tx, "ctc"),
        eval_step=ctc_train.make_eval_step(model, "ctc"),
        state=state, scheduler=sched,
        ckpt=CheckpointManager(str(tmp_path / name)),
        train_loader=loader, eval_loader=loader,
        max_epochs=2, check_freq=3, verbose=False)


def test_mid_epoch_resume(tmp_path):
    mgr = make_mgr(tmp_path, "a")
    mgr.run()  # 10 steps over 2 epochs, ckpt every 3 steps
    assert mgr.global_step == 10

    # resume from the mid-epoch checkpoint at step 3 (epoch 1, 3 steps in)
    mgr2 = make_mgr(tmp_path, "b")
    first_ck = mgr.ckpt.entries[0][0]
    mgr2.resume(mgr.ckpt.path(first_ck))
    assert mgr2.global_step == 3
    mgr2.run()
    # replays epoch 1 skipping 3 consumed batches → ends at the same
    # total step count
    assert mgr2.global_step == 10


def test_manager_profile_trace(tmp_path):
    mgr = make_mgr(tmp_path, "prof")
    mgr.profile_steps = (2, 4)
    mgr.run()
    prof_dir = os.path.join(mgr.ckpt.dir, "profile")
    assert os.path.isdir(prof_dir)
    # a trace dump was written
    found = []
    for root, _, files in os.walk(prof_dir):
        found.extend(files)
    assert found, "no profiler trace files written"
