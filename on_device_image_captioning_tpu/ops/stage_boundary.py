"""Pallas TPU kernels for the Swin stage BOUNDARIES: patch embed and patch
merging (downsample), emitting/consuming the window-partitioned layout the
fused block kernels run in.

Motivation (round-3 b32 HLO profile, after the in-kernel window transitions
landed): ~12 ms/forward of the remaining backbone time was XLA-side boundary
work — the window partition/reverse relayout copies at stage entry/exit
(models/swin.py:406/414, ~0.45 ms each), a 226 MB f32 materialization of the
patch-merging 2x2 concat feeding each downsample LayerNorm (common.py:66,
0.69 ms just for the copy), the separate convert+reduce LayerNorm fusions,
and f32 GEMM output traffic at the patch embed. With the stages themselves
window-resident, these kernels close the chain: activations enter window
layout at the patch embed and never leave it until stage 3 (whose 12x12
resolution is a single window, so window layout IS the flat layout).

- `patch_embed_fused`: space-to-depth'd image rows -> GEMM + LN -> window
  layout, one program per (image, window-row). Replaces the XLA GEMM (f32
  convolution output), the LayerNorm fusion, and the stage-0 entry partition
  copies. Reference semantics: models/swin_transformer_mod.py:611-655
  (strided Conv2d + LN), layout per models/swin.py _window_partition.

- `downsample_fused`: window layout of stage i -> 2x2 neighborhood merge +
  LN + reduction GEMM -> window layout of stage i+1. The merge draws each
  output window from a fixed 2x2 source-window neighborhood (same structure
  as the shift transitions, models/swin.py transition_pieces) through ONE
  constant one-hot (4n, 4n) row-selection matrix ridden on the MXU — exact:
  one 1.0 term per output row, and the rows are picked (not summed), so the
  bf16 values pass through bit-identically before the fp32 LN. Reference
  semantics: models/swin_transformer_mod.py:466-510 (PatchMerging; concat
  order x0,x1,x2,x3 = (even,even),(odd,even),(even,odd),(odd,odd) rows/cols).

Both kernels keep the XLA path's numerics: fp32 LN stats, bf16 GEMM operands
with fp32 accumulation, outputs cast back to the compute dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .swin_block_fused import _linear, _ln

# Process-wide toggle for A/B measurement: "kernel" runs the fused boundary
# path (window-resident backbone end to end), "xla" keeps the boundaries on
# the XLA ops (partition/reverse + patch_merging/patch_embed).
_BOUNDARY_IMPL = "kernel"


def set_boundary_impl(impl: str) -> None:
    global _BOUNDARY_IMPL
    assert impl in ("kernel", "xla"), impl
    _BOUNDARY_IMPL = impl


def get_boundary_impl() -> str:
    return _BOUNDARY_IMPL


@functools.lru_cache(maxsize=None)
def merge_selection(window: int) -> np.ndarray:
    """One-hot (4n, 4n) row-selection matrix for the 2x2 patch merge.

    Source stack order (rows): the four source windows of one output window,
    laid out [(a=0,b=0), (a=0,b=1), (a=1,b=0), (a=1,b=1)] where a/b index the
    2x2 source-window neighborhood (row/col half), each window flattened to
    n = window^2 tokens. Output rows: channel group g in the reference's
    concat order (di,dj) = (0,0),(1,0),(0,1),(1,1) stacked along rows, each
    group holding the n output tokens; output token (i,j) of group (di,dj)
    selects source pixel (2i+di, 2j+dj) of the 2window x 2window patch."""
    n = window * window
    sel = np.zeros((4 * n, 4 * n), np.float32)
    for g, (di, dj) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        for i in range(window):
            for j in range(window):
                pi, pj = 2 * i + di, 2 * j + dj
                a, b = pi // window, pj // window
                src = (a * 2 + b) * n + (pi % window) * window + (pj % window)
                sel[g * n + i * window + j, src] = 1.0
    return sel


def _patch_embed_kernel(
    x_ref, w_ref, b_ref, g_ref, be_ref, out_ref, *, W, window, n, eps
):
    c_in = x_ref.shape[-1]
    rows = x_ref[0].reshape(window * W * window, c_in)
    y = _linear(rows, w_ref, b_ref)
    y = _ln(y, g_ref, be_ref, eps)
    c_out = y.shape[-1]
    # raster rows (i, wc, jl) -> window layout (wc, i, jl)
    y = y.reshape(window, W, window, c_out)
    for wc in range(W):
        out_ref[wc] = y[:, wc].reshape(n, c_out)


def patch_embed_fused(
    x_s2d: jnp.ndarray,
    proj: dict,
    norm: dict,
    window: int,
    eps: float,
) -> jnp.ndarray:
    """x_s2d: (B, H/ps, W/ps, ps*ps*3) space-to-depth'd images in the compute
    dtype. Returns the patch embedding directly in window layout
    (B * (res/window)^2, window^2, embed_dim)."""
    b, res, res2, c_in = x_s2d.shape
    assert res == res2 and res % window == 0
    W = res // window
    n = window * window
    c_out = proj["w"].shape[1]
    dtype = x_s2d.dtype

    def const(shape):
        return pl.BlockSpec(
            shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weights = [
        proj["w"].astype(dtype), proj["b"],
        norm["scale"], norm["bias"],
    ]
    return pl.pallas_call(
        functools.partial(
            _patch_embed_kernel, W=W, window=window, n=n, eps=eps
        ),
        grid=(b * W,),
        in_specs=[
            pl.BlockSpec(
                (1, window, res, c_in),
                lambda t, W=W: (t // W, t % W, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *[const(w.shape) for w in weights],
        ],
        out_specs=pl.BlockSpec(
            (W, n, c_out), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * W * W, n, c_out), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * res * res * c_in * c_out,
            bytes_accessed=(x_s2d.size + b * res * res * c_out)
            * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x_s2d, *weights)


def _downsample_kernel(
    xa_ref, xb_ref, sel_ref, w_ref, g_ref, be_ref, out_ref,
    *, W_out, n, c, eps,
):
    sel = sel_ref[:]
    for wc in range(W_out):
        src = jnp.concatenate(
            [
                xa_ref[2 * wc], xa_ref[2 * wc + 1],
                xb_ref[2 * wc], xb_ref[2 * wc + 1],
            ],
            axis=0,
        )  # (4n, c) — [(a0,b0), (a0,b1), (a1,b0), (a1,b1)]
        y = jax.lax.dot_general(
            sel, src, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(src.dtype)  # exact row pick: one 1.0 term per output row
        merged = jnp.concatenate(
            [y[g * n : (g + 1) * n] for g in range(4)], axis=1
        )  # (n, 4c) in the reference's x0..x3 channel-group order
        h = _ln(merged, g_ref, be_ref, eps)
        out_ref[wc] = jnp.dot(
            h, w_ref[:].astype(h.dtype), preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def downsample_fused(
    xw: jnp.ndarray,
    norm: dict,
    reduction: dict,
    W_in: int,
    window: int,
    eps: float,
) -> jnp.ndarray:
    """xw: (B * W_in^2, n, C) window layout of stage i. Returns stage i+1's
    input (B * (W_in/2)^2, n, 2C), also in window layout. The reduction GEMM
    has no bias (reference PatchMerging: nn.Linear(4C, 2C, bias=False))."""
    bw, n, c = xw.shape
    assert n == window * window and W_in % 2 == 0
    nw_in = W_in * W_in
    assert bw % nw_in == 0
    b = bw // nw_in
    W_out = W_in // 2
    dtype = xw.dtype
    sel = jnp.asarray(merge_selection(window), dtype)

    def idx_row(k):
        def f(t):
            img = t // W_out
            return (img * W_in + 2 * (t % W_out) + k, 0, 0)

        return f

    def const(shape):
        return pl.BlockSpec(
            shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weights = [sel, reduction["w"].astype(dtype), norm["scale"], norm["bias"]]
    return pl.pallas_call(
        functools.partial(
            _downsample_kernel, W_out=W_out, n=n, c=c, eps=eps
        ),
        grid=(b * W_out,),
        in_specs=[
            pl.BlockSpec((W_in, n, c), idx_row(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W_in, n, c), idx_row(1), memory_space=pltpu.VMEM),
            *[const(w.shape) for w in weights],
        ],
        out_specs=pl.BlockSpec(
            (W_out, n, 2 * c), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * W_out * W_out, n, 2 * c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bw * n * (4 * n + 2 * c) * c,
            bytes_accessed=3 * xw.size * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xw, xw, *weights)
