"""Learning-rate schedules as optax-compatible callables.

Ports of the reference schedulers (``utils/lr_scheduler.py``,
``runners/schedule.py``) in closed form (step → lr):

* :func:`exponential_decay_schedule` — ``ExponentialDecayScheduler``
  (lr_scheduler.py:5-36): warmup coefficient × exponential decay from base_lr
  to final_lr over total_iters.
* :func:`noam_schedule` — ``NoamScheduler`` (lr_scheduler.py:39-56).
* :func:`warmup_linear_schedule` — ``WarmupLinearSchedule``
  (lr_scheduler.py:58-85): linear warmup then step-γ decay every
  ``update_epoch`` steps.
* :func:`warmup_cosine_schedule` — ``WarmupCosineSchedule``
  (runners/schedule.py:5-22).

The reference steps its schedulers starting from ``_step_count = 1``; these
closed forms take the optax step (starting at 0) and add 1 internally.
"""
from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

from acvae_tpu.core.registry import SCHEDULES

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


@SCHEDULES.register("ExponentialDecayScheduler")
def exponential_decay_schedule(base_lr: float, total_iters: int, final_lr: float,
                               warmup_iters: int = 3000,
                               linear_warmup: bool = False) -> Schedule:
    if warmup_iters >= total_iters:
        # The reference formula evaluates exp(((it − warmup)/total) ·
        # log(final/base)) with it ≪ warmup; when total_iters < warmup_iters
        # the exponent reaches +|log(final/base)|·warmup/total and the lr
        # explodes (~1e14 observed for a 1-epoch run with the default 3000
        # warmup — instant nan).  Shrink warmup to 10% of the run in that
        # degenerate regime; sane-regime (warmup < total) values are
        # untouched.  Documented divergence — the reference has the same
        # blow-up (utils/lr_scheduler.py:16-26).
        warmup_iters = max(1, total_iters // 10)

    def schedule(step):
        it = step + 1
        warmup = jnp.minimum(it / warmup_iters, 1.0)
        decay = jnp.exp(((it - warmup_iters) / total_iters)
                        * math.log(final_lr / base_lr))
        if linear_warmup:
            lr = jnp.where(it <= warmup_iters, warmup * base_lr,
                           warmup * base_lr * decay)
        else:
            lr = warmup * base_lr * decay
        return lr
    return schedule


@SCHEDULES.register("NoamScheduler")
def noam_schedule(base_lr: float, model_size: int = 512,
                  warmup_iters: int = 3000) -> Schedule:
    factor = base_lr / (model_size ** -0.5 * warmup_iters ** -0.5)

    def schedule(step):
        it = step + 1.0
        return factor * model_size ** -0.5 * jnp.minimum(
            it ** -0.5, it * warmup_iters ** -1.5)
    return schedule


@SCHEDULES.register("WarmupLinearSchedule")
def warmup_linear_schedule(base_lr: float, warmup_steps: int, gamma: float,
                           update_epoch: int) -> Schedule:
    def schedule(step):
        it = step + 1
        warmup = jnp.where(it < warmup_steps, it / warmup_steps, 1.0)
        decayed = base_lr * gamma ** ((it - warmup_steps) // update_epoch)
        return jnp.where(it < warmup_steps, warmup * base_lr, decayed)
    return schedule


@SCHEDULES.register("WarmupCosineSchedule")
def warmup_cosine_schedule(base_lr: float, warmup_steps: int,
                           t_total: int, cycles: float = 0.5) -> Schedule:
    def schedule(step):
        it = step + 1.0
        warmup_lr = base_lr * it / jnp.maximum(1.0, warmup_steps)
        progress = (it - warmup_steps) / jnp.maximum(1.0, t_total - warmup_steps)
        cosine = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * cycles * 2.0 * progress)))
        return jnp.where(it < warmup_steps, warmup_lr, base_lr * cosine)
    return schedule


@SCHEDULES.register("constant")
def constant_schedule(base_lr: float) -> Schedule:
    return lambda step: jnp.asarray(base_lr)


def build_schedule(name: str, base_lr: float, **kwargs) -> Schedule:
    return SCHEDULES.build(name, base_lr=base_lr, **kwargs)
