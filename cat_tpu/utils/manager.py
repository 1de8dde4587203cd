"""Train-loop orchestrator (the Manager).

Counterpart of /root/reference/cat/shared/manager.py:34-716: epoch loop
with eval-gated checkpointing, LR scheduling, early stop, grad
accumulation and metric logging — redesigned for SPMD jit:

- ONE compiled train step per bucket shape; lr enters as data.
- Gradient accumulation (manager.py:660-676 no_sync fold semantics) is
  implemented in utils.grad_accum.WeightedMultiSteps, wired in by the
  task make_train_step(grad_accum_fold=N); the Manager's part is
  counting LR-scheduler steps per optimizer UPDATE, not per micro-batch
  (pass the same fold here).
- The eval loss all_reduce (manager.py:710-711) is just a jnp.mean under
  jit over the sharded batch.
- Resume = load state pytree + scheduler/step bookkeeping
  (manager.py:296-345).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.struct

from cat_tpu.utils.checkpoint import (CheckpointManager, load_checkpoint,
                                      save_checkpoint)
from cat_tpu.utils.scheduler import Scheduler, State


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.int32


class MetricLogger:
    """JSONL metric log + console (replaces the rank-0 SummaryWriter,
    manager.py:335-345). Multi-host: only process 0 writes/prints —
    every process logging to a shared filesystem would interleave."""

    def __init__(self, log_dir, quiet=False):
        self.primary = jax.process_index() == 0
        if self.primary:
            os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self.quiet = quiet

    def log(self, **kv):
        if not self.primary:
            return
        kv["time"] = time.time()
        with open(self.path, "a") as f:
            f.write(json.dumps(
                kv, default=lambda o: o.item()
                if hasattr(o, "item") else str(o)) + "\n")
        if not self.quiet:
            msg = " | ".join(f"{k}={v:.5g}" if isinstance(v, float)
                             else f"{k}={v}" for k, v in kv.items()
                             if k != "time")
            print(msg, flush=True)


class Manager:
    """Drives training given jitted step functions.

    Args:
      train_step: fn(state, batch_dict, lr, rng) -> (state, metrics_dict)
      eval_step: fn(state, batch_dict) -> metrics_dict with 'loss','count'
      state: initial TrainState
      scheduler: cat_tpu.utils.scheduler.Scheduler
      ckpt: CheckpointManager
      train_loader / eval_loader: iterables of Batch (see utils.data);
        train_loader must expose .epoch(i).
    """

    def __init__(self, train_step, eval_step, state, scheduler: Scheduler,
                 ckpt: CheckpointManager, train_loader, eval_loader,
                 logger: Optional[MetricLogger] = None, rng=None,
                 put_batch: Callable = None, max_epochs: int = 10000,
                 check_freq: int = -1, verbose: bool = True,
                 profile_steps: Optional[tuple] = None,
                 grad_accum_fold: int = 1,
                 eval_metric: Optional[Callable] = None,
                 batch_transform: Optional[Callable] = None):
        self.train_step = train_step
        self.eval_step = eval_step
        self.state = state
        self.scheduler = scheduler
        self.ckpt = ckpt
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.logger = logger or MetricLogger(ckpt.dir, quiet=not verbose)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.put_batch = put_batch or (lambda b: b)
        self.max_epochs = max_epochs
        self.check_freq = check_freq  # steps between evals; -1 = per epoch
        # loader Batch -> train/eval-step payload. Default: plain dict of
        # arrays. Task adapters override it to reshape the payload (JSA
        # needs uids for its sampler cache; P2G shifts targets).
        self.batch_transform = batch_transform or (lambda b: b.asdict())
        # grad accumulation: the LR schedule advances once per optimizer
        # UPDATE (fold micro-batches), matching the reference where the
        # scheduler steps per fold-closing batch (manager.py:660-676)
        self.grad_accum_fold = max(int(grad_accum_fold), 1)
        # optional custom dev metric (e.g. WER via beam decode) used as
        # the scheduler metric instead of dev loss — the reference's
        # custom_evaluate (cat/ctc/train.py:213-281). Signature:
        # eval_metric(state) -> float (lower is better).
        self.eval_metric = eval_metric
        self.epoch = 0
        self.global_step = 0
        # (start_step, stop_step): capture a jax.profiler device trace
        # into <ckpt_dir>/profile between these global steps (the
        # tracing affordance the reference lacks, SURVEY.md §5)
        self.profile_steps = profile_steps
        self._profiling = False

    # ------------- persistence -------------

    def save(self, metric):
        state_dict = {
            "state": self.state,
            "scheduler": self.scheduler.state_dict(),
            "epoch": self.epoch,
            "step": self.global_step,
            "steps_into_epoch": getattr(self, "_steps_into_epoch", 0),
        }
        # multi-host: checkpoint._to_host consolidates ZeRO-sharded
        # leaves on EVERY process (the allgather is collective), but
        # only process 0 touches the filesystem (manager.py:414-450
        # rank-0 save semantics)
        if jax.process_count() > 1:
            from cat_tpu.utils.checkpoint import _to_host

            state_dict = _to_host(state_dict)
            if jax.process_index() != 0:
                return None
        return self.ckpt.save(state_dict, metric, self.global_step,
                              self.epoch)

    def resume(self, path):
        ck = load_checkpoint(path)
        self.state = jax.tree_util.tree_map(
            lambda ref, x: jnp.asarray(x), self.state, ck["state"])
        self.scheduler.load_state_dict(ck["scheduler"])
        # plain ints: pickled values round-trip as 0-d numpy arrays,
        # and in-place += on an aliased array corrupts bookkeeping
        self.global_step = int(ck["step"])
        steps_in = int(ck.get("steps_into_epoch", 0))
        if steps_in > 0:
            # replay the interrupted epoch, skipping consumed batches
            self.epoch = int(ck["epoch"]) - 1
            self._resume_skip_steps = steps_in
        else:
            self.epoch = int(ck["epoch"])

    def load_init_model(self, path):
        """--init-model: weights only (manager.py:303-318)."""
        ck = load_checkpoint(path)
        params = ck["state"].params if hasattr(ck["state"], "params") \
            else ck["state"]["params"]
        self.state = self.state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, params))

    # ------------- loops -------------

    def evaluate(self):
        total, count = 0.0, 0.0
        for batch in self.eval_loader:
            m = self.eval_step(self.state,
                               self.put_batch(self.batch_transform(batch)))
            total += float(m["loss_sum"])
            count += float(m["count"])
        return total / max(count, 1.0)

    def run(self):
        terminated = False
        # mid-epoch resume: replay the interrupted epoch, skipping
        # already-consumed steps (manager.py:601-611 step_by_last_epoch)
        skip = getattr(self, "_resume_skip_steps", 0)
        while not terminated and self.epoch < self.max_epochs:
            self.epoch += 1
            self._steps_into_epoch = skip
            t_data, t_step = 0.0, 0.0
            t0 = time.time()
            for batch in self.train_loader.epoch(self.epoch):
                if skip > 0:
                    skip -= 1
                    t0 = time.time()
                    continue
                t_data += time.time() - t0
                self.global_step += 1
                if self.profile_steps is not None:
                    start, stop = self.profile_steps
                    if self.global_step == start and not self._profiling:
                        jax.profiler.start_trace(
                            os.path.join(self.ckpt.dir, "profile"))
                        self._profiling = True
                    elif self.global_step == stop and self._profiling:
                        jax.profiler.stop_trace()
                        self._profiling = False
                self._steps_into_epoch += 1
                self.scheduler.update_lr_step(
                    -(-self.global_step // self.grad_accum_fold))
                self.rng, sub = jax.random.split(self.rng)
                t1 = time.time()
                self.state, metrics = self.train_step(
                    self.state, self.put_batch(self.batch_transform(batch)),
                    jnp.float32(self.scheduler.lr), sub)
                t_step += time.time() - t1
                if self.check_freq > 0 and \
                        self.global_step % self.check_freq == 0:
                    terminated = self._checkpoint_round(metrics)
                    if terminated:
                        break
                t0 = time.time()
            self._steps_into_epoch = 0  # epoch completed
            if not terminated and self.check_freq <= 0:
                terminated = self._checkpoint_round(None)
            self.logger.log(epoch=self.epoch, data_s=t_data,
                            step_s=t_step)
        return self.scheduler.best_metric

    def _checkpoint_round(self, last_train_metrics):
        dev_loss = self.evaluate()
        metric = dev_loss
        kv = dict(step=self.global_step, epoch=self.epoch,
                  dev_loss=dev_loss)
        if self.eval_metric is not None:
            metric = float(self.eval_metric(self.state))
            kv["dev_metric"] = metric
        st = self.scheduler.step(metric)
        kv.update(lr=self.scheduler.lr, sched=st.name)
        if last_train_metrics is not None:
            kv["train_loss"] = float(last_train_metrics.get("loss", 0.0))
        self.logger.log(**kv)
        self.save(metric)
        return st == State.TERMINATED
