"""Pallas TPU kernel: fused dynamic-int8 matmul (quantize -> int8 MXU -> dequant).

The XLA w8a8 path (deploy/quantization.py `quantized_matmul`) materializes the
quantized activation tensor between the rounding step and the dot; this kernel
keeps the int8 tile in VMEM: each program quantizes its activation tile, runs the
int8 x int8 MXU matmul with int32 accumulation, and rescales to float in one
pass. Grid tiles over (M, N) with the full K resident (K <= 2048 for every
matmul in this model).

Used by deploy/quantization.quantized_matmul when `use_pallas=True` on TPU;
numerics match the XLA path bit-for-bit (same rint/clip and scales).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, xs_ref, wq_ref, ws_ref, b_ref, out_ref):
    x_scale = xs_ref[0, 0]
    x_q = jnp.clip(jnp.rint(x_ref[:] / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (x_scale * ws_ref[0, :])
    if b_ref is not None:
        y = y + b_ref[0, :]
    out_ref[:] = y


def _pad_to(a, axis, mult):
    size = a.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n"))
def quantized_matmul_pallas(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    tile_m: int = 256,
    tile_n: int = 512,
) -> jnp.ndarray:
    """x: (M, K) float; w_q: (K, N) int8; w_scale: (N,). Returns (M, N) f32."""
    m, k = x.shape
    _, n = w_q.shape
    x_scale = (jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0).reshape(1, 1)

    xp = _pad_to(x.astype(jnp.float32), 0, tile_m)
    wqp = _pad_to(w_q, 1, tile_n)
    wsp = _pad_to(w_scale.reshape(1, -1), 1, tile_n)
    bp = _pad_to(bias.reshape(1, -1).astype(jnp.float32), 1, tile_n) if bias is not None else None
    mp, np_ = xp.shape[0], wqp.shape[1]

    grid = (mp // tile_m, np_ // tile_n)
    in_specs = [
        pl.BlockSpec((tile_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((k, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [xp, x_scale, wqp, wsp]
    if bp is not None:
        in_specs.append(
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        )
        args.append(bp)
        kernel = _kernel
    else:
        def kernel(x_ref, xs_ref, wq_ref, ws_ref, out_ref):
            _kernel(x_ref, xs_ref, wq_ref, ws_ref, None, out_ref)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=xp.size * 4 + wqp.size + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out[:m, :n]
