"""RAdam as an optax gradient transformation.

Functional rebuild of the rectified-Adam variant the reference trains with
(reference optims/radam.py:9-137, credited there to Liyuan Liu). Semantics
preserved, including the conservative gates:

- rectification applies only when the SMA length N_sma >= 5;
- below that, `degenerated_to_sgd=True` takes a bias-corrected momentum step,
  while False (the reference's default; train.py passes no flag) takes NO step;
- weight decay is decoupled-style `p -= wd * lr * p` applied inside the gated
  branches.

Being stateless-functional, the per-step scalar coefficients are computed with
jnp ops inside the update (the reference's `buffer` memoization is a Python-side
optimization with no numeric effect).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def radam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    degenerated_to_sgd: bool = False,
) -> optax.GradientTransformation:
    """learning_rate: float or schedule fn step -> lr (the reference drives lr
    entirely through a LambdaLR schedule over base_lr=1.0, train.py:490-528)."""

    def init(params):
        return RAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("radam requires params")
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate

        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

        t = count.astype(jnp.float32)
        beta2_t = b2**t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)

        rect = jnp.sqrt(
            (1.0 - beta2_t)
            * (n_sma - 4.0)
            / (n_sma_max - 4.0)
            * (n_sma - 2.0)
            / n_sma
            * n_sma_max
            / (n_sma_max - 2.0)
        ) / (1.0 - b1**t)
        momentum_step = 1.0 / (1.0 - b1**t)

        use_rect = n_sma >= 5.0

        def upd(m, v, p):
            denom = jnp.sqrt(v) + eps
            rect_step = -rect * lr * m / denom + (-weight_decay * lr) * p
            sgd_step = -momentum_step * lr * m + (-weight_decay * lr) * p
            if degenerated_to_sgd:
                fallback = sgd_step
            else:
                fallback = jnp.zeros_like(p)  # reference: no update when N_sma < 5
            return jnp.where(use_rect, rect_step, fallback)

        updates = jax.tree.map(upd, mu, nu, params)
        return updates, RAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def plain_radam(
    learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0
) -> optax.GradientTransformation:
    """PlainRAdam (reference optims/radam.py:140-237): same as radam with
    degenerated_to_sgd=True and no buffering."""
    return radam(learning_rate, b1, b2, eps, weight_decay, degenerated_to_sgd=True)
