"""Learning-rate schedules.

The reference drives a torch LambdaLR over base_lr=1.0 with two lambdas
(reference train.py:503-528); these are the same functions as optax schedules
(step -> absolute lr).
"""
from __future__ import annotations

import jax.numpy as jnp


def annealing(
    lr: float, warmup_iters: int, anneal_every_epoch: float, num_batches: int,
    anneal_coeff: float = 0.8,
):
    """(min(it, warmup)/warmup) * lr * coeff^(it // (anneal_every_epoch * num_batches))
    (reference train.py:503-515; coefficient hard-coded 0.8 there)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(step, warmup_iters) / warmup_iters
        decay = anneal_coeff ** jnp.floor(
            step / (anneal_every_epoch * num_batches)
        )
        return warm * lr * decay

    return schedule


def custom_warmup_anneal(
    lr: float, warmup_iters: int, min_lr: float, anneal_coeff: float,
    anneal_every_epoch: float, num_batches: int,
):
    """max((it >= warmup) * min_lr,
           (lr / max(warmup - it, 1)) * coeff^(it // (num_batches * anneal_every)))
    (reference train.py:516-526)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        gate = (step >= warmup_iters).astype(jnp.float32) * min_lr
        ramp = lr / jnp.maximum(warmup_iters - step, 1.0)
        decay = anneal_coeff ** jnp.floor(
            step / (num_batches * anneal_every_epoch)
        )
        return jnp.maximum(gate, ramp * decay)

    return schedule
