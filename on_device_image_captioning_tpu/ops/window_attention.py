"""Pallas TPU kernel: fused (shifted-)window attention.

Computes, entirely in VMEM per window, what the XLA path in models/swin.py
expresses as five ops (scores matmul, relative-position-bias add, shift-mask add,
softmax, value matmul) — one kernel invocation per window with all heads
processed in-register, so the (H, N, N) attention tensor never round-trips HBM
(reference behavior: models/swin_transformer_mod.py:222-272).

Window geometry is static per stage (N = window^2 = 144 for Swin-L/384), so the
bias is pre-gathered to (H, N, N) and the wrap-around mask indexed by
window-id = program_id % num_windows via the BlockSpec index map.

The fallback/default XLA path remains in models/swin.py; SwinConfig selects the
implementation (`attention_impl`), and tests assert elementwise equivalence.

Measured on TPU v5e (Swin-L/384, batch 8, bf16, scalar-output timing so tunnel
transfer doesn't pollute): XLA 72.7 ms vs this kernel 89.9 ms for the full
backbone. XLA's batched dot_general keeps the MXU busier than this one-window-
per-program grid (contraction dim is only head_dim=32), so 'xla' stays the
default; the kernel remains as the correctness-verified baseline for a future
multi-window-per-program variant.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, scale, heads):
    for h in range(heads):
        q = q_ref[0, h].astype(jnp.float32) * scale  # (N, dk)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, N)
        s = s + bias_ref[h]
        if mask_ref is not None:
            s = s + mask_ref[0]
        s = jax.nn.softmax(s, axis=-1)
        out_ref[0, h] = jax.lax.dot_general(
            s.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "num_windows"))
def window_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    num_windows: int,
) -> jnp.ndarray:
    """q/k/v: (BW, H, N, dk); bias: (H, N, N); mask: (nW, N, N) additive or None.
    Returns (BW, H, N, dk) attention outputs."""
    bw, heads, n, dk = q.shape
    qkv_spec = pl.BlockSpec(
        (1, heads, n, dk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        qkv_spec,
        qkv_spec,
        qkv_spec,
        pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, bias.astype(jnp.float32)]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, n, n), lambda i: (i % num_windows, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask.astype(jnp.float32))
        kernel = functools.partial(_attn_kernel, scale=scale, heads=heads)
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
            _attn_kernel(
                q_ref, k_ref, v_ref, bias_ref, None, out_ref,
                scale=scale, heads=heads,
            )

    return pl.pallas_call(
        kernel,
        grid=(bw,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, heads, n, dk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bw, heads, n, dk), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bw * heads * (n * n * dk * 2),
            bytes_accessed=q.size * 4 * 4,
            transcendentals=bw * heads * n * n,
        ),
        # CPU (tests, virtual meshes) runs the kernel in interpreter mode
        interpret=jax.default_backend() != "tpu",
    )(*args)
