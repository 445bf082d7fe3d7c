"""Training losses.

Label-smoothing loss semantics follow the reference (reference losses/loss.py:5-39):
KL divergence between log-softmaxed predictions and a smoothed one-hot whose
uniform mass is smoothing/(V-1) (PAD excluded from the smoothing denominator),
with PAD target rows zeroed and the sum divided by the number of non-pad tokens.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pad_idx: int,
    smoothing: float = 0.1,
    divide_by_non_pads: bool = True,
) -> jnp.ndarray:
    """logits: (B, T, V) pre-softmax; targets: (B, T) int.

    KL(target_dist || softmax(logits)) summed over classes. Computed without
    materializing the (B, T, V) one-hot: for target distribution q with uniform
    u = smoothing/(V-1) on all classes and confidence c = 1-smoothing added on
    the target class (replacing its uniform mass),
        sum_v q_v * (log q_v - logp_v)
          = [u * sum_v(log q...) term folded analytically] — computed directly
    to match torch's elementwise kl_div (zero where q == 0).
    """
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    u = smoothing / (v - 1)
    c = 1.0 - smoothing

    # torch kl_div(reduction='none') = q * (log q - logp), with 0 where q == 0.
    # Σ_v q_v logp_v = u * Σ_v logp_v + (c - u) * logp_target
    sum_logp = jnp.sum(logp, axis=-1)
    tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    cross = u * sum_logp + (c - u) * tgt_logp

    # Σ_v q_v log q_v: V-1 classes at u plus the target class at c
    # (constant wrt params, kept for value parity with the reference loss)
    ent = (v - 1) * u * jnp.log(jnp.maximum(u, 1e-30)) + c * jnp.log(
        jnp.maximum(c, 1e-30)
    )

    per_pos = ent - cross
    non_pad = targets != pad_idx
    per_pos = jnp.where(non_pad, per_pos, 0.0)
    total = jnp.sum(per_pos)
    if divide_by_non_pads:
        return total / jnp.maximum(jnp.sum(non_pad), 1)
    return total


def scst_loss(
    sample_logprobs: jnp.ndarray,
    rewards: jnp.ndarray,
    baselines: jnp.ndarray,
) -> jnp.ndarray:
    """REINFORCE with baseline (reference losses/reward.py:87-89):
    mean over (B, num_samples) of (r - b) * sum_t(-logp_t).

    sample_logprobs: (B, N, T) per-step logprobs, zero after EOS;
    rewards/baselines: (B, N).
    """
    neg_logp = jnp.sum(-sample_logprobs, axis=-1)
    return jnp.mean((rewards - baselines) * neg_logp)


def mean_baseline(rewards: jnp.ndarray) -> jnp.ndarray:
    """Leave-one-out mean of the other samples' rewards
    (reference losses/reward.py:67-70)."""
    n = rewards.shape[-1]
    return (jnp.sum(rewards, axis=-1, keepdims=True) - rewards) / (n - 1)
