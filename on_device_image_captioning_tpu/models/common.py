"""Shared functional building blocks: linear / layernorm / embedding / dropout.

Parameters are plain pytrees (nested dicts of jnp arrays); every apply function is
pure. Weight layout is JAX convention: linear weights are (in, out) — the torch
checkpoint converter transposes (see params/torch_convert.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear_init(rng, d_in: int, d_out: int, scheme: str = "xavier_uniform"):
    wkey, _ = jax.random.split(rng)
    if scheme == "xavier_uniform":
        # matches torch nn.init.xavier_uniform_ (reference models/End_ExpansionNet_v2.py:112-114)
        limit = (6.0 / (d_in + d_out)) ** 0.5
        w = jax.random.uniform(wkey, (d_in, d_out), jnp.float32, -limit, limit)
    elif scheme == "trunc_normal":
        # matches timm trunc_normal_(std=.02) (reference models/swin_transformer_mod.py:52-94)
        w = 0.02 * jax.random.truncated_normal(wkey, -2.0, 2.0, (d_in, d_out), jnp.float32)
    else:
        raise ValueError(scheme)
    return {"w": w, "b": jnp.zeros((d_out,), jnp.float32)}


def linear(p, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    if "w_q" in p:  # int8-quantized node (deploy/quantization.py)
        from ..deploy.quantization import quantized_matmul

        return quantized_matmul(p, x)
    w, b = p["w"], p["b"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    y = y + b.astype(y.dtype)
    # keep activations in the compute dtype: fp32 activation traffic is what
    # bounds the backbone on HBM bandwidth (accumulation above stays fp32)
    return y.astype(dtype) if dtype is not None else y


def layernorm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


# LayerNorm implementation: 'xla' (default) or 'pallas' (fused kernel,
# ops/layernorm.py — profiling showed the XLA convert+reduce chains around the
# bf16 activation stream cost ~26% of the Swin forward). Process-wide toggle.
_LN_IMPL = "xla"


def set_layernorm_impl(impl: str) -> None:
    global _LN_IMPL
    assert impl in ("xla", "pallas"), impl
    _LN_IMPL = impl


def layernorm(p, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch.nn.LayerNorm over the last dim (biased variance), stats in fp32."""
    if _LN_IMPL == "pallas" and x.ndim >= 2:
        from ..ops.layernorm import layernorm_pallas

        return layernorm_pallas(x, p["scale"], p["bias"], eps)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def embedding_init(rng, num: int, dim: int, scheme: str = "xavier_uniform"):
    if scheme == "xavier_uniform":
        limit = (6.0 / (num + dim)) ** 0.5
        t = jax.random.uniform(rng, (num, dim), jnp.float32, -limit, limit)
    else:
        t = 0.02 * jax.random.truncated_normal(rng, -2.0, 2.0, (num, dim), jnp.float32)
    return {"embed": t}


def embedding(p, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["embed"], idx, axis=0)


def dropout(
    rng: Optional[jax.Array], rate: float, x: jnp.ndarray, train: bool
) -> jnp.ndarray:
    """Inverted dropout, identity when not training (torch semantics)."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class RngStream:
    """Deterministic sequence of rng keys for threading dropout through a forward
    pass. `None`-safe: when constructed with None (eval), next() returns None."""

    def __init__(self, rng: Optional[jax.Array]):
        self._rng = rng

    def next(self) -> Optional[jax.Array]:
        if self._rng is None:
            return None
        self._rng, out = jax.random.split(self._rng)
        return out
