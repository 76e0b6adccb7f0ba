"""Learning-rate schedules.

Capability parity with the reference's gluoncv `LRSequential(LRScheduler...)`
construction (`/root/reference/train_yolov3.py:517-525`): linear warmup from
`warmup_lr` (0) to `lr` over `warmup_epochs`, followed by one of
  * step: multiply by `lr_decay` at each epoch in `lr_decay_epoch`
  * poly: polynomial decay to 0 at `epochs` (power 2, gluoncv default)
  * cosine: cosine decay to 0 at `epochs`
Expressed as a pure step->lr function usable inside the jitted train step.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

__all__ = ["lr_schedule"]


def lr_schedule(
    mode: str,
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    warmup_epochs: int = 0,
    warmup_lr: float = 0.0,
    lr_decay: float = 0.1,
    lr_decay_epochs: Sequence[int] = (),
    power: int = 2,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns f(step) -> lr.  `lr_decay_epochs` are offsets *after* warmup,
    like the reference's `lr_decay_epoch - warmup_epochs` (train_yolov3.py:519)."""
    assert mode in ("step", "poly", "cosine", "constant")
    warmup_steps = warmup_epochs * steps_per_epoch
    total_steps = max((epochs - warmup_epochs) * steps_per_epoch, 1)
    decay_steps = jnp.asarray([e * steps_per_epoch for e in lr_decay_epochs])

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        wf = jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0)
        warm = warmup_lr + (base_lr - warmup_lr) * wf
        t = jnp.clip((step - warmup_steps) / total_steps, 0.0, 1.0)
        if mode == "step":
            n = jnp.sum(step - warmup_steps >= decay_steps) if len(lr_decay_epochs) else 0
            main = base_lr * (lr_decay**n)
        elif mode == "poly":
            main = base_lr * (1.0 - t) ** power
        elif mode == "cosine":
            main = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        else:
            main = jnp.asarray(base_lr)
        return jnp.where(step < warmup_steps, warm, main)

    return sched
