"""Pallas TPU kernel: fused LayerNorm over the last axis.

Profiling the Swin-L forward showed ~26% of device time in convert+reduce
fusions — the fp32 upcast/mean/var/downcast chains XLA builds around each
LayerNorm of the bf16 activation stream (92 norms per forward). This kernel
reads the bf16 tile once, computes mean/variance in fp32 registers, and writes
the normalized bf16 tile once.

Differentiable via custom_vjp: the backward pass recomputes the standard
LayerNorm gradient in plain jnp from saved (x, scale) — training works with the
kernel on the forward path.

Opt-in through models/common.set_layernorm_impl('pallas'); the XLA path stays
the default and tests assert equivalence (interpreter mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[0, :] + bias_ref[0, :]
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layernorm_pallas(x, scale, bias, eps: float = 1e-5):
    return _forward(x, scale, bias, eps)


def _forward(x, scale, bias, eps):
    orig_shape = x.shape
    c = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, c)
    tile = 256 if rows % 256 == 0 else (128 if rows % 128 == 0 else 8)
    pad = (-rows) % tile
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = (x2.shape[0] // tile,)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(
        x2,
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
    )
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)


def _fwd(x, scale, bias, eps):
    return _forward(x, scale, bias, eps), (x, scale)


def _bwd(eps, res, g):
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    gy = gf * scale.astype(jnp.float32)
    n = x.shape[-1]
    dx = rstd * (
        gy
        - jnp.mean(gy, axis=-1, keepdims=True)
        - xhat * jnp.mean(gy * xhat, axis=-1, keepdims=True)
    )
    axes = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gf * xhat, axis=axes).astype(scale.dtype)
    dbias = jnp.sum(gf, axis=axes).astype(scale.dtype)
    return dx.astype(x.dtype), dscale, dbias


layernorm_pallas.defvjp(_fwd, _bwd)
