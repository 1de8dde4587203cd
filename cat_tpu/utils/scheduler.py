"""LR schedulers + optimizer building (optax), JSON-configured.

Pure-python state machines mirroring the reference semantics exactly
(/root/reference/cat/shared/scheduler.py:90-511: State, SchedulerEarlyStop,
SchedulerFixedStop, SchedulerEarlyStopWithWarmup, SchedulerNoam,
SchedulerNoamEarlyStop, SchedulerLinearAnnealing, SchedulerCosineAnnealing)
— but decoupled from the optimizer: the scheduler owns a scalar `lr` that
the (jitted) train step receives as data each step, so LR changes never
retrace. ZeRO-1 (scheduler.py:50-87 ZeroRedundancyOptimizer) is subsumed
by sharding the optax state over the mesh (see cat_tpu.parallel).
"""
from __future__ import annotations

import math
from enum import Enum

import optax


class State(Enum):
    IMPROVED = 0
    CONTINUE = 1
    TERMINATED = 2


def build_optimizer(cfg: dict):
    """cfg: {"type": "Adam"|"AdamW"|"SGD"|..., "kwargs": {...},
    "grad_clip": float?}. Returns an optax transform whose learning rate
    is injected per-step (use with Scheduler.lr)."""
    name = cfg["type"].lower()
    kwargs = dict(cfg.get("kwargs", {}))
    lr = kwargs.pop("lr", 1e-3)
    kwargs.pop("zeroredundancy", None)
    table = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "adadelta": optax.adadelta,
        "adagrad": optax.adagrad,
        "rmsprop": optax.rmsprop,
        "lamb": optax.lamb,
    }
    if name not in table:
        raise ValueError(f"unknown optimizer {cfg['type']}")
    if name in ("adam", "adamw") and "betas" in kwargs:
        b1, b2 = kwargs.pop("betas")
        kwargs.update(b1=b1, b2=b2)
    tx = optax.inject_hyperparams(lambda learning_rate: _rebuild(
        name, learning_rate, kwargs, cfg))(learning_rate=lr)
    return tx, lr


def _rebuild(name, lr, kwargs, cfg):
    table = {
        "adam": optax.adam, "adamw": optax.adamw, "sgd": optax.sgd,
        "adadelta": optax.adadelta, "adagrad": optax.adagrad,
        "rmsprop": optax.rmsprop, "lamb": optax.lamb,
    }
    kw = dict(kwargs)
    if name == "adam" and "weight_decay" in kw:
        wd = kw.pop("weight_decay")
        return optax.adamw(lr, weight_decay=wd, **kw)
    return table[name](lr, **kw)


class Scheduler:
    """Base: tracks best metric (descending by default) and current lr."""

    def __init__(self, lr_init: float, reverse: bool = False):
        self.lr = float(lr_init)
        self.init_lr = float(lr_init)
        self._reverse = reverse
        self.best_metric = float("-inf") if reverse else float("inf")

    def _is_improved(self, metric):
        return self._reverse ^ (metric < self.best_metric)

    def update_lr_step(self, n_step: int):
        return None

    def step(self, metric: float) -> State:
        if self._is_improved(metric):
            self.best_metric = metric
            return State.IMPROVED
        return State.CONTINUE

    def state_dict(self):
        return {k: v for k, v in self.__dict__.items()}

    def load_state_dict(self, d):
        self.__dict__.update(d)


class SchedulerEarlyStop(Scheduler):
    """scheduler.py:52-133: tolerate n_tol worse evals, then LR *= gamma
    until stop_lr → TERMINATED. min_step guards early evals."""

    def __init__(self, lr_init, min_step=0, stop_lr=1e-5, n_tol=1,
                 gamma=0.1, reverse=False):
        super().__init__(lr_init, reverse)
        self.stop_lr = stop_lr
        self.min_step = min_step
        self._in_min_step = True
        self.n_tol = n_tol
        self._cnt_worse = 0
        self.gamma = gamma

    def _check_hit_stop(self, new_lr):
        return (self.stop_lr <= new_lr) ^ (self.gamma < 1.0)

    def update_lr_step(self, n_step):
        if self._in_min_step and n_step >= self.min_step:
            self._in_min_step = False

    def step(self, metric):
        if self._is_improved(metric):
            self.best_metric = metric
            return State.IMPROVED
        if self._in_min_step:
            return State.CONTINUE
        self._cnt_worse += 1
        if self._cnt_worse > self.n_tol:
            if self._check_hit_stop(self.lr * self.gamma):
                return State.TERMINATED
            self.lr *= self.gamma
            self._cnt_worse = 0
        return State.CONTINUE


class SchedulerFixedStop(Scheduler):
    """scheduler.py:136-181: run exactly stop_step steps."""

    def __init__(self, lr_init, stop_step, reverse=False):
        super().__init__(lr_init, reverse)
        self.stop_step = int(stop_step)
        self._in_stop_step = True

    def update_lr_step(self, n_step):
        if self._in_stop_step and n_step >= self.stop_step:
            self._in_stop_step = False

    def step(self, metric):
        if self._in_stop_step:
            if self._is_improved(metric):
                self.best_metric = metric
                return State.IMPROVED
            return State.CONTINUE
        return State.TERMINATED


class SchedulerEarlyStopWithWarmup(SchedulerEarlyStop):
    """scheduler.py:184-241: linear warmup to max_lr over warmup_step,
    then early-stop behavior."""

    def __init__(self, lr_init, warmup_step, max_lr=None, min_step=None,
                 stop_lr=1e-5, n_tol=1, gamma=0.1, reverse=False):
        if max_lr is None:
            max_lr = lr_init
        if min_step is None:
            min_step = warmup_step
        start_lr = max_lr / max(warmup_step, 1)
        super().__init__(start_lr, min_step, stop_lr, n_tol, gamma, reverse)
        self.lr_addon = (max_lr - start_lr) / max(warmup_step, 1)

    def update_lr_step(self, n_step):
        if self._in_min_step:
            self.lr = self.lr + self.lr_addon
            if n_step >= self.min_step:
                self._in_min_step = False


class SchedulerNoam(SchedulerFixedStop):
    """scheduler.py:363-392: lr = peak_factor/sqrt(dim_model) *
    min(1/sqrt(n), n/warmup^1.5)."""

    def __init__(self, lr_init=None, dim_model=512, warmup_step=4000,
                 stop_step=100000, peak_factor=1.0, reverse=False):
        ref = peak_factor / math.sqrt(dim_model)
        super().__init__(ref, stop_step, reverse)
        self.ref_lr = ref
        self._den_in_warmup = 1.0 / math.sqrt(warmup_step) / warmup_step
        self.update_lr_step(1)

    def update_lr_step(self, n_step):
        super().update_lr_step(n_step)
        n_step = max(n_step, 1)
        self.lr = self.ref_lr * min(1.0 / math.sqrt(n_step),
                                    n_step * self._den_in_warmup)


class SchedulerNoamEarlyStop(SchedulerEarlyStop):
    """scheduler.py:395-436: Noam curve + early-stop LR decay folded into
    the reference lr."""

    def __init__(self, lr_init=None, dim_model=512, warmup_step=4000,
                 peak_factor=1.0, stop_lr=1e-5, n_tol=0, gamma=0.1,
                 min_step=-1, reverse=False):
        if min_step == -1:
            min_step = warmup_step
        ref = peak_factor / math.sqrt(dim_model)
        super().__init__(ref, min_step, stop_lr, n_tol, gamma, reverse)
        self.ref_lr = ref
        self._den_in_warmup = 1.0 / math.sqrt(warmup_step) / warmup_step
        self.update_lr_step(1)

    def update_lr_step(self, n_step):
        SchedulerEarlyStop.update_lr_step(self, n_step)
        n_step = max(n_step, 1)
        self.lr = self.ref_lr * min(1.0 / math.sqrt(n_step),
                                    n_step * self._den_in_warmup)

    def step(self, metric):
        prev_lr = self.lr
        state = super().step(metric)
        if prev_lr > 0:
            self.ref_lr *= self.lr / prev_lr
        return state


class SchedulerLinearAnnealing(SchedulerFixedStop):
    """scheduler.py:439-474: linear decay from init to stop_lr between
    min_step and stop_step."""

    def __init__(self, lr_init, min_step, stop_lr, stop_step,
                 reverse=False):
        super().__init__(lr_init, stop_step, reverse)
        self.min_step = min_step
        self._in_min_step = True
        self._lr_addon = -(lr_init - stop_lr) / (stop_step - min_step)

    def update_lr_step(self, n_step):
        if self._in_min_step:
            if n_step >= self.min_step:
                self._in_min_step = False
        elif self._in_stop_step:
            self.lr = self.lr + self._lr_addon
            if n_step >= self.stop_step:
                self._in_stop_step = False


class SchedulerCosineAnnealing(SchedulerFixedStop):
    """scheduler.py:477-511: (periodic) cosine annealing with decay."""

    def __init__(self, lr_init, min_lr, stop_step, period=0,
                 decay_factor=1.0, reverse=False):
        super().__init__(lr_init, stop_step, reverse)
        if period == 0:
            period = stop_step
        self.period = period
        self.decay_factor = decay_factor
        self.min_lr = min_lr
        self._ref_lr = lr_init

    def update_lr_step(self, n_step):
        super().update_lr_step(n_step)
        max_lr = self._ref_lr * self.decay_factor ** (
            (n_step - 1) // self.period)
        self.lr = (self.min_lr + 0.5 * (max_lr - self.min_lr)
                   * (1 + math.cos(((n_step - 1) % self.period)
                                   / self.period * math.pi)))


_REGISTRY = {
    "Scheduler": Scheduler,
    "SchedulerEarlyStop": SchedulerEarlyStop,
    "SchedulerFixedStop": SchedulerFixedStop,
    "SchedulerEarlyStopWithWarmup": SchedulerEarlyStopWithWarmup,
    "SchedulerNoam": SchedulerNoam,
    "SchedulerNoamEarlyStop": SchedulerNoamEarlyStop,
    "SchedulerLinearAnnealing": SchedulerLinearAnnealing,
    "SchedulerCosineAnnealing": SchedulerCosineAnnealing,
}


def build_scheduler(cfg: dict):
    """cfg = {"type": ..., "kwargs": {...}, "optimizer": {...}} — same
    shape as the reference (scheduler.py:16-47, no eval())."""
    if cfg["type"] not in _REGISTRY:
        raise ValueError(f"unknown scheduler {cfg['type']}")
    tx, lr = build_optimizer(cfg["optimizer"])
    kwargs = dict(cfg.get("kwargs", {}))
    kwargs.setdefault("lr_init", lr)
    sched = _REGISTRY[cfg["type"]](**kwargs)
    return sched, tx
