"""Pallas TPU kernel: fully fused Swin transformer block for the shallow stages.

The round-1 profile showed Swin-L stages 0/1 are HBM-bandwidth-bound: the XLA
path materializes ~8 intermediate activation tensors per block (LN output, qkv,
attention scores, softmax, attention output, proj output, MLP hidden, MLP
output) over huge token grids (96x96x192 / 48x48x384), several hundred MB of
HBM round trips per block at batch 8. This kernel computes the ENTIRE block —
LN1 + qkv + per-head windowed attention (relative-position bias + shift mask)
+ proj + residual + LN2 + fc1 + exact GeLU + fc2 + residual — in one VMEM pass
over a strip of windows, so HBM traffic drops to x-in + x-out + (weights once).

Reference semantics: models/swin_transformer_mod.py:397-449 (block) and
:222-272 (attention). Numerics mirror models/swin.py's XLA path op-for-op:
fp32 LN stats, bf16 matmul operands with fp32 accumulation, fp32 softmax, and
exact (erf) GeLU in fp32.

Scope: inference (no dropout/drop-path — both are zero at eval) on stages whose
full weight set fits VMEM alongside a window strip (Swin-L stages 0 and 1; the
18-block stage 2 stays on the scanned XLA path, stage 3's 1536-dim weights
don't fit). Selected via SwinConfig.attention_impl == "fused"; training and
ineligible stages fall back to the XLA path automatically.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target activation elements (rows * channels) per program: big enough to keep
# the MXU fed, small enough that the ~10 VMEM-resident intermediates (x in/out
# double-buffered, fp32 LN output, qkv, scratch, MLP hidden) fit beside the
# weights under the 16 MB scoped-vmem limit
_TARGET_ELEMS = 8 * 144 * 192
# weight bytes cap for eligibility (qkv + proj + fc1 + fc2 in compute dtype)
_WEIGHT_BYTES_CAP = 8 * 1024 * 1024
# cap for each HALF-block kernel (attention-only / MLP-only) used on stages
# whose full weight set doesn't fit (Swin-L stage 2, dim 768)
_HALF_WEIGHT_BYTES_CAP = 10 * 1024 * 1024
# NOTE on the attention inner loop: a batched-dot_general-over-heads variant
# (reshape (n, c) -> (n, h, dk) + transpose) does not lower — Mosaic rejects
# lane-splitting reshapes ("unsupported shape cast") — so the per-head
# lane-slice loop below is the layout that works.


def windows_per_program(
    num_windows: int, n_tokens: int, channels: int, total_windows: int = 0
) -> int:
    """Largest divisor of num_windows with wpb * n * c <= the element target.

    total_windows: batch * num_windows — very long grids (batch >= 32 at
    Swin-L stage 0) get deeper DMA pipelining from Mosaic and blow the 16 MB
    scoped-vmem budget at the full strip size, so halve the target there
    (measured: b32 OOMs by ~1 MB at 8 windows/program, fits at 4)."""
    target = _TARGET_ELEMS if total_windows < 1024 else _TARGET_ELEMS // 2
    best = 1
    for wpb in range(1, num_windows + 1):
        if num_windows % wpb == 0 and wpb * n_tokens * channels <= target:
            best = wpb
    return best


def eligible(dim: int, mlp_ratio: float, dtype) -> bool:
    """Whether the stage's full weight set fits the VMEM budget."""
    itemsize = jnp.dtype(dtype).itemsize
    weights = dim * 3 * dim + dim * dim + 2 * dim * int(dim * mlp_ratio)
    return weights * itemsize <= _WEIGHT_BYTES_CAP


def eligible_halves(dim: int, mlp_ratio: float, dtype) -> bool:
    """Whether each half-block kernel's weights fit the VMEM budget."""
    itemsize = jnp.dtype(dtype).itemsize
    attn_w = (dim * 3 * dim + dim * dim) * itemsize
    mlp_w = 2 * dim * int(dim * mlp_ratio) * itemsize
    return max(attn_w, mlp_w) <= _HALF_WEIGHT_BYTES_CAP


def _ln(x, g_ref, b_ref, eps):
    """torch LayerNorm, fp32 stats (models/common.py layernorm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * g_ref[:] + b_ref[:]).astype(x.dtype)


def _linear(x, w_ref, b_ref):
    """bf16 operands, fp32 accumulate, cast back (models/common.py linear)."""
    y = jnp.dot(x, w_ref[:].astype(x.dtype), preferred_element_type=jnp.float32)
    return (y + b_ref[:].astype(jnp.float32)).astype(x.dtype)


def _erf(x):
    """fp32 erf (Abramowitz & Stegun 7.1.26, |err| < 1.5e-7) — Mosaic has no
    erf/erfc primitive, so exact-GeLU builds on exp instead."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """0.5 x (1 + erf(x / sqrt(2))) in fp32 (torch GELU default, matching the
    XLA path's jax.nn.gelu(approximate=False) to ~1e-7)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _weight(node: dict, dtype):
    """Dense or int8-quantized linear node -> compute-dtype weight matrix.

    For quantized nodes ({'w_q', 'scale'}, deploy/quantization.py) the dequant
    runs ONCE per pallas_call under jit — unlike the XLA fallback, where the
    dequant is re-materialized next to every consumer (the round-1 w8
    regression). HBM keeps the int8 copy; only the transient bf16 view exists
    per block invocation."""
    if "w_q" in node:
        return (node["w_q"].astype(dtype) * node["scale"].astype(dtype)).astype(
            dtype
        )
    return node["w"].astype(dtype)


def _bias_of(node: dict, d_out: int):
    return node.get("b", jnp.zeros((d_out,)))


def _attention_rows(
    qkv, attn_scr, bias_ref, mask_ref, *, heads, n, wpb, c, scale
):
    """Per-window multi-head attention over flat (wpb*n, 3c) qkv rows, writing
    (wpb*n, c) into attn_scr — shared by the whole-block and attention-half
    kernels."""
    dk = c // heads
    for w in range(wpb):
        row0 = w * n
        for h in range(heads):
            col = h * dk
            q = qkv[row0 : row0 + n, col : col + dk] * scale
            k = qkv[row0 : row0 + n, c + col : c + col + dk]
            v = qkv[row0 : row0 + n, 2 * c + col : 2 * c + col + dk]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + bias_ref[h]
            if mask_ref is not None:
                s = s + mask_ref[w]
            p = jax.nn.softmax(s, axis=-1)
            attn_scr[row0 : row0 + n, col : col + dk] = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(attn_scr.dtype)


def _block_kernel(
    x_ref,
    g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    bias_ref,
    mask_ref,
    out_ref,
    attn_scr,
    *,
    heads: int,
    n: int,
    wpb: int,
    scale: float,
    eps: float,
):
    c = x_ref.shape[-1]
    rows = wpb * n
    x = x_ref[:].reshape(rows, c)

    # ---- attention sublayer -------------------------------------------------
    xn = _ln(x, g1_ref, b1_ref, eps)
    qkv = _linear(xn, wqkv_ref, bqkv_ref)  # (rows, 3c)
    _attention_rows(
        qkv, attn_scr, bias_ref, mask_ref,
        heads=heads, n=n, wpb=wpb, c=c, scale=scale,
    )
    x = x + _linear(attn_scr[:], wproj_ref, bproj_ref)

    # ---- MLP sublayer -------------------------------------------------------
    h2 = _ln(x, g2_ref, b2_ref, eps)
    hidden = _linear(h2, wfc1_ref, bfc1_ref)
    hidden = _gelu_exact(hidden.astype(jnp.float32)).astype(hidden.dtype)
    out_ref[:] = (x + _linear(hidden, wfc2_ref, bfc2_ref)).reshape(wpb, n, c)


@functools.partial(
    jax.jit, static_argnames=("heads", "num_windows", "scale", "eps")
)
def swin_block_fused(
    x: jnp.ndarray,
    p: dict,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    heads: int,
    num_windows: int,
    scale: float,
    eps: float,
) -> jnp.ndarray:
    """x: (B*nW, N, C) window-partitioned block input (pre-rolled when shifted).
    p: the swin block param dict (norm1/attn/norm2/mlp). bias: (H, N, N) fp32
    pre-gathered relative-position bias. mask: (nW, N, N) additive or None.
    Returns the full block output in the same window layout.
    """
    bw, n, c = x.shape
    wpb = windows_per_program(num_windows, n, c, bw)
    grid = (bw // wpb,)
    mask_blocks = num_windows // wpb

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weights = [
        p["norm1"]["scale"], p["norm1"]["bias"],
        _weight(p["attn"]["qkv"], x.dtype), _bias_of(p["attn"]["qkv"], 3 * c),
        _weight(p["attn"]["proj"], x.dtype), _bias_of(p["attn"]["proj"], c),
        p["norm2"]["scale"], p["norm2"]["bias"],
        _weight(p["mlp"]["fc1"], x.dtype),
        _bias_of(p["mlp"]["fc1"], p["mlp"]["fc1"]["w" if "w" in p["mlp"]["fc1"] else "w_q"].shape[1]),
        _weight(p["mlp"]["fc2"], x.dtype), _bias_of(p["mlp"]["fc2"], c),
    ]
    in_specs = [
        pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        *[const(w.shape) for w in weights],
        const((heads, n, n)),
    ]
    args = [x, *weights, bias.astype(jnp.float32)]
    kernel = functools.partial(
        _block_kernel, heads=heads, n=n, wpb=wpb, scale=scale, eps=eps
    )
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (wpb, n, n), lambda i: (i % mask_blocks, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask.astype(jnp.float32))
    else:
        kernel = functools.partial(
            _no_mask_wrapper, heads=heads, n=n, wpb=wpb, scale=scale, eps=eps
        )

    fc1 = p["mlp"]["fc1"]
    mlp_hidden = (fc1["w"] if "w" in fc1 else fc1["w_q"]).shape[1]
    flops_per_row = 2 * c * (3 * c + c + 2 * mlp_hidden) + 2 * 2 * n * c
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((wpb * n, c), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=bw * n * flops_per_row,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=bw * n * (heads * n + mlp_hidden),
        ),
        # CPU (tests, virtual meshes) runs the kernel in interpreter mode
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _no_mask_wrapper(
    x_ref, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, wfc1, bfc1, wfc2, bfc2,
    bias_ref, out_ref, attn_scr, *, heads, n, wpb, scale, eps,
):
    _block_kernel(
        x_ref, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, wfc1, bfc1, wfc2,
        bfc2, bias_ref, None, out_ref, attn_scr,
        heads=heads, n=n, wpb=wpb, scale=scale, eps=eps,
    )


# ---------------------------------------------------------------------------
# Half-block kernels: for stages whose full weight set exceeds VMEM (Swin-L
# stage 2, dim 768 = 14 MB of bf16 weights) the block splits into two fused
# passes, each holding only its own weights: x + proj(attn(LN1 x)) in window
# layout, then x + fc2(gelu(fc1(LN2 x))) over flat position-wise rows.
# ---------------------------------------------------------------------------


def _attn_half_kernel(
    x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias_ref, mask_ref, out_ref, attn_scr,
    *, heads, n, wpb, scale, eps,
):
    c = x_ref.shape[-1]
    rows = wpb * n
    x = x_ref[:].reshape(rows, c)
    xn = _ln(x, g1_ref, b1_ref, eps)
    qkv = _linear(xn, wqkv_ref, bqkv_ref)
    _attention_rows(
        qkv, attn_scr, bias_ref, mask_ref,
        heads=heads, n=n, wpb=wpb, c=c, scale=scale,
    )
    out_ref[:] = (x + _linear(attn_scr[:], wproj_ref, bproj_ref)).reshape(
        wpb, n, c
    )


def _attn_half_no_mask(
    x_ref, g1, b1, wqkv, bqkv, wproj, bproj, bias_ref, out_ref, attn_scr,
    *, heads, n, wpb, scale, eps,
):
    _attn_half_kernel(
        x_ref, g1, b1, wqkv, bqkv, wproj, bproj, bias_ref, None, out_ref,
        attn_scr, heads=heads, n=n, wpb=wpb, scale=scale, eps=eps,
    )


@functools.partial(
    jax.jit, static_argnames=("heads", "num_windows", "scale", "eps")
)
def swin_attn_half_fused(
    x: jnp.ndarray,
    p: dict,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    heads: int,
    num_windows: int,
    scale: float,
    eps: float,
) -> jnp.ndarray:
    """x + proj(window_attention(LN1(x))) on window-partitioned x (B*nW, N, C)."""
    bw, n, c = x.shape
    wpb = windows_per_program(num_windows, n, c, bw)
    mask_blocks = num_windows // wpb

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weights = [
        p["norm1"]["scale"], p["norm1"]["bias"],
        _weight(p["attn"]["qkv"], x.dtype), _bias_of(p["attn"]["qkv"], 3 * c),
        _weight(p["attn"]["proj"], x.dtype), _bias_of(p["attn"]["proj"], c),
    ]
    in_specs = [
        pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        *[const(w.shape) for w in weights],
        const((heads, n, n)),
    ]
    args = [x, *weights, bias.astype(jnp.float32)]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (wpb, n, n), lambda i: (i % mask_blocks, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask.astype(jnp.float32))
        kernel = functools.partial(
            _attn_half_kernel, heads=heads, n=n, wpb=wpb, scale=scale, eps=eps
        )
    else:
        kernel = functools.partial(
            _attn_half_no_mask, heads=heads, n=n, wpb=wpb, scale=scale, eps=eps
        )

    return pl.pallas_call(
        kernel,
        grid=(bw // wpb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((wpb * n, c), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=bw * n * (2 * c * 4 * c + 4 * n * c),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=bw * n * heads * n,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _mlp_half_kernel(
    x_ref, g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, out_ref,
    *, eps,
):
    x = x_ref[:]
    h = _ln(x, g2_ref, b2_ref, eps)
    h = _linear(h, wfc1_ref, bfc1_ref)
    h = _gelu_exact(h.astype(jnp.float32)).astype(h.dtype)
    out_ref[:] = x + _linear(h, wfc2_ref, bfc2_ref)


def _quant_rows(h):
    """Per-row dynamic symmetric int8 quantization: (h_q int8, scale (R, 1))."""
    s = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-8) / 127.0
    return jnp.clip(jnp.rint(h / s), -127, 127).astype(jnp.int8), s


def _mlp_half_kernel_a8(
    x_ref, g2_ref, b2_ref, w1q_ref, s1_ref, b1_ref, w2q_ref, s2_ref, b2b_ref,
    out_ref, *, eps,
):
    """int8 x int8 MXU MLP half (w8a8): weights stay int8 in VMEM, activations
    quantize per row on the fly, int32 accumulation, float epilogue. The MXU's
    int8 path has ~2x the bf16 throughput and this half is the backbone's most
    MXU-bound kernel, so this is where int8 actually wins (VERDICT item 8)."""
    x = x_ref[:]
    h = _ln(x, g2_ref, b2_ref, eps).astype(jnp.float32)
    hq, hs = _quant_rows(h)
    acc = jax.lax.dot_general(
        hq, w1q_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (hs * s1_ref[:]) + b1_ref[:]
    y = _gelu_exact(y)
    yq, ys = _quant_rows(y)
    acc2 = jax.lax.dot_general(
        yq, w2q_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    z = acc2.astype(jnp.float32) * (ys * s2_ref[:]) + b2b_ref[:]
    out_ref[:] = x + z.astype(x.dtype)


def _mlp_rows_per_program(total_rows: int, hidden: int) -> int:
    """Largest divisor of total_rows whose fp32+bf16 hidden fits ~4.5 MB."""
    cap = max(1, (4_500_000 // (6 * hidden)) or 1)
    best = 1
    for r in range(1, min(total_rows, cap) + 1):
        if total_rows % r == 0:
            best = r
    return best


@functools.partial(jax.jit, static_argnames=("eps",))
def swin_mlp_half_fused(x: jnp.ndarray, p: dict, eps: float) -> jnp.ndarray:
    """x + fc2(gelu(fc1(LN2(x)))) over flat rows (R, C) — position-wise, so no
    window layout is needed. w8a8-quantized nodes run the int8 MXU kernel;
    dense / weight-only nodes run the bf16 kernel (w8 dequants once per call).
    """
    shape = x.shape
    c = shape[-1]
    rows = x.size // c
    xf = x.reshape(rows, c)
    fc1, fc2 = p["mlp"]["fc1"], p["mlp"]["fc2"]
    a8 = "w_q" in fc1 and "a8" in fc1
    hidden = (fc1["w_q"] if "w_q" in fc1 else fc1["w"]).shape[1]
    rpp = _mlp_rows_per_program(rows, hidden)

    def const(shp):
        return pl.BlockSpec(
            shp, lambda i: tuple(0 for _ in shp), memory_space=pltpu.VMEM
        )

    if a8:
        kernel = functools.partial(_mlp_half_kernel_a8, eps=eps)
        weights = [
            p["norm2"]["scale"], p["norm2"]["bias"],
            fc1["w_q"], fc1["scale"], _bias_of(fc1, hidden),
            fc2["w_q"], fc2["scale"], _bias_of(fc2, c),
        ]
    else:
        kernel = functools.partial(_mlp_half_kernel, eps=eps)
        weights = [
            p["norm2"]["scale"], p["norm2"]["bias"],
            _weight(fc1, x.dtype), _bias_of(fc1, hidden),
            _weight(fc2, x.dtype), _bias_of(fc2, c),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(rows // rpp,),
        in_specs=[
            pl.BlockSpec((rpp, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[const(w.shape) for w in weights],
        ],
        out_specs=pl.BlockSpec((rpp, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=rows * 4 * c * hidden,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=rows * hidden,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xf, *weights)
    return out.reshape(shape)
