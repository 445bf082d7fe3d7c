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

Scope: stages whose full weight set fits VMEM alongside a window strip (Swin-L
stages 0 and 1; the 18-block stage 2 runs attention-half + MLP-half kernels at
inference and stays on the scanned XLA path for training, stage 3's 1536-dim
weights don't fit). Selected via SwinConfig.attention_impl == "fused";
ineligible stages fall back to the XLA path automatically. TRAINING on the
eligible stages goes through swin_block_fused_train (bottom of this file): the
same forward fused kernel extended with stochastic-depth scales, plus a
custom VJP whose two backward kernels recompute the block internals
flash-attention style.
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


def _largest_divisor_wpb(
    num_windows: int, n_tokens: int, channels: int, target: int
) -> int:
    """Largest divisor of num_windows with wpb * n * c <= target elements."""
    best = 1
    for wpb in range(1, num_windows + 1):
        if num_windows % wpb == 0 and wpb * n_tokens * channels <= target:
            best = wpb
    return best


def windows_per_program(
    num_windows: int, n_tokens: int, channels: int, total_windows: int = 0,
    quantized: bool = False,
) -> int:
    """Largest divisor of num_windows with wpb * n * c <= the element target.

    total_windows: batch * num_windows — very long grids (batch >= 32 at
    Swin-L stage 0) get deeper DMA pipelining from Mosaic and blow the 16 MB
    scoped-vmem budget at the full strip size, so halve the target there
    (measured: b32 OOMs by ~1 MB at 8 windows/program, fits at 4).

    quantized: int8 weight nodes dequantize inside the fusion feeding the
    kernel, whose temps ride the same scoped-vmem budget — at the full strip
    the w8 stage-1 kernel overflows by 12 KB (measured), so shave the
    target."""
    target = _TARGET_ELEMS if total_windows < 1024 else _TARGET_ELEMS // 2
    if quantized:
        target = target * 7 // 8
    return _largest_divisor_wpb(num_windows, n_tokens, channels, target)


def train_fwd_wpb(num_windows: int, n_tokens: int, channels: int, bw: int) -> int:
    """Strip size for the TRAINING forward kernels: 3/4 of the inference
    target. The train variants hold the extra x2 output (full mode) / SMEM
    drop-path scales beside the inference buffer set; at the full inference
    strip size a fresh compile overflows the 16 MB scoped-vmem budget by
    ~1 MB (measured: Swin-L stage 0, b8, bf16 — 16.94M vs the 16M limit;
    cached executables from other flag environments masked this)."""
    target = (3 * _TARGET_ELEMS // 4) if bw < 1024 else (3 * _TARGET_ELEMS // 8)
    return _largest_divisor_wpb(num_windows, n_tokens, channels, target)


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
    """fp32 erf (Abramowitz & Stegun 7.1.28, |err| <= 3e-7) — Mosaic has no
    erf/erfc primitive. This form is EXP-FREE: a degree-6 polynomial, four
    squarings for ^16, one reciprocal — the transcendental exp of the
    former 7.1.26 form cost ~1.2 ms/block at Swin-L stage 0 b32 (measured;
    see STATUS round-3). Overflow of y^16 at |x| >~ 15 saturates through
    inf -> 1/inf = 0 -> erf = +-1, which is the correct limit."""
    a1, a2, a3, a4, a5, a6 = (
        0.0705230784, 0.0422820123, 0.0092705272,
        0.0001520143, 0.0002765672, 0.0000430638,
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    y = 1.0 + ax * (
        a1 + ax * (a2 + ax * (a3 + ax * (a4 + ax * (a5 + ax * a6))))
    )
    y2 = y * y
    y4 = y2 * y2
    y8 = y4 * y4
    return s * (1.0 - 1.0 / (y8 * y8))


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


# Inference attention inner-loop implementation: "perhead" (the original
# per-(window, head) lane-slice loop) or "packed" (all heads of a window in
# two MXU dots over a block-diagonal head mask + one stacked softmax pass).
# Numerically identical: the packed dot contracts over the full c with zeros
# in the off-head lanes (zero products don't perturb fp32 accumulation) and
# the stacked softmax reduces the same per-row value sets. Train/backward
# kernels always use "perhead" (their scoped-VMEM budgets are tuned to it).
_INFER_ATTN_ROWS_IMPL = "perhead"


def set_infer_attn_rows_impl(impl: str) -> None:
    """perhead: per-(window, head) lane-slice loop. packed: all heads per
    window in two masked MXU dots (heads-fold FLOP waste — measured a wash).
    grouped: heads in groups of 4 (gs*dk = the 128 MXU contraction at dk=32)
    — per-head padded FLOPs, quarter the dispatches/softmaxes."""
    global _INFER_ATTN_ROWS_IMPL
    assert impl in ("perhead", "packed", "grouped", "pipelined"), impl
    _INFER_ATTN_ROWS_IMPL = impl


# Inter-block window-transition implementation for the window-resident
# inference stages: "gather" (XLA-level composed-permutation jnp.take between
# kernels) or "kernel" (the transition folds into the NEXT block's Pallas
# kernel as one-hot MXU dots over a 2x2 source-window neighborhood — see
# _transition_strip / models/swin.py transition_pieces). Numerically exact
# either way. Measured b32 bf16 Swin-L backbone (pipelined): gather 85.1 ms,
# kernel 81.9 ms — the XLA transpose+gather+transpose chains (~6.8 ms of
# 'data formatting') collapse into ~2.3 ms of in-kernel P4 dots + double
# source fetches. Also measured: splitting the per-window P4 dot into two
# contiguous-slice (n, 2n) dots to avoid the VMEM concat is SLOWER
# (83.2 ms) — two 288->384-padded contractions cost more MXU cycles than
# one 576->640 dot plus the concat copies.
_TRANSITION_IMPL = "kernel"


def set_transition_impl(impl: str) -> None:
    global _TRANSITION_IMPL
    assert impl in ("gather", "kernel"), impl
    _TRANSITION_IMPL = impl


def get_transition_impl() -> str:
    return _TRANSITION_IMPL


def _attention_rows_packed(
    qkv, attn_scr, bias_ref, mask_ref, *, heads, n, wpb, c, scale
):
    """All heads of one window per MXU dot: scores = (head-stacked, lane-
    masked Q) x K contracted over the FULL channel dim (192/384 vs the
    per-head dk=32 — 4-12x better MXU contraction utilization), softmax over
    the (heads*n, n) stack in ONE max/exp/sum dispatch instead of `heads`,
    then one (heads*n, n) x (n, c) value dot whose off-diagonal head blocks
    are zeroed-and-folded back to (n, c) by aligned sublane adds. Cuts the
    Mosaic instruction count per window from ~6*heads ops + 2*heads dots to
    ~8 ops + 2 dots."""
    dk = c // heads
    hn = heads * n
    row_head = jax.lax.broadcasted_iota(jnp.int32, (hn, c), 0) // n
    col_head = jax.lax.broadcasted_iota(jnp.int32, (hn, c), 1) // dk
    head_sel = row_head == col_head  # (hn, c) block-diagonal head mask
    bias_flat = bias_ref[:].reshape(hn, n)
    for w in range(wpb):
        row0 = w * n
        q = qkv[row0 : row0 + n, 0:c] * scale
        k = qkv[row0 : row0 + n, c : 2 * c]
        v = qkv[row0 : row0 + n, 2 * c : 3 * c]
        q_rep = jnp.where(
            head_sel, jnp.concatenate([q] * heads, axis=0), 0
        ).astype(q.dtype)
        s = jax.lax.dot_general(
            q_rep, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias_flat
        if mask_ref is not None:
            s = s + jnp.concatenate([mask_ref[w]] * heads, axis=0)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        inv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        r = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # zero off-head lane blocks, fold the per-row normalization in, and
        # collapse the head stack with `heads` aligned sublane adds
        r = r * jnp.where(head_sel, inv, 0.0)
        acc = r[0:n]
        for h in range(1, heads):
            acc = acc + r[h * n : (h + 1) * n]
        attn_scr[row0 : row0 + n, :] = acc.astype(attn_scr.dtype)


def _attention_rows_grouped(
    qkv, attn_scr, bias_ref, mask_ref, *, heads, n, wpb, c, scale, gs=4
):
    """Heads processed in groups of `gs` (default 4, so gs*dk == 128 at the
    Swin-L dk=32): the group's score dot runs a block-diagonal head-stacked Q
    (gs*n, gs*dk) against the gs-head K slab contracting the FULL group
    width — per-group padded MXU cycles are IDENTICAL to gs per-head dk=32
    dots (each pads its contraction 32->128), but there are gs-fold fewer
    dot/softmax dispatches, and the softmax max/exp/sum passes run once over
    the (gs*n, n) stack instead of gs times. Unlike the all-heads 'packed'
    variant, no extra FLOPs: off-block lanes are zero, contributing nothing
    to the fp32 accumulation (exact).

    Value dot: R = P_stack (gs*n, n) @ V_slab (n, gs*dk); piece k's useful
    (n, dk) output is its diagonal block R[k*n:(k+1)*n, k*dk:(k+1)*dk] —
    sliced out, never added, so cross-head products are discarded exactly."""
    dk = c // heads
    gw = gs * dk
    row_piece = jax.lax.broadcasted_iota(jnp.int32, (gs * n, gw), 0) // n
    col_piece = jax.lax.broadcasted_iota(jnp.int32, (gs * n, gw), 1) // dk
    blkdiag = row_piece == col_piece
    groups = []
    h0 = 0
    while h0 < heads:
        g = min(gs, heads - h0)
        groups.append((h0, g))
        h0 += g
    for w in range(wpb):
        row0 = w * n
        for h0, g in groups:
            col = h0 * dk
            width = g * dk
            sel = blkdiag[: g * n, :width]
            q_slab = qkv[row0 : row0 + n, col : col + width] * scale
            k_slab = qkv[row0 : row0 + n, c + col : c + col + width]
            v_slab = qkv[row0 : row0 + n, 2 * c + col : 2 * c + col + width]
            q_stack = jnp.where(
                sel, jnp.concatenate([q_slab] * g, axis=0), 0
            ).astype(q_slab.dtype)
            s = jax.lax.dot_general(
                q_stack, k_slab,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + bias_ref[h0 : h0 + g].reshape(g * n, n)
            if mask_ref is not None:
                s = s + jnp.concatenate([mask_ref[w]] * g, axis=0)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            inv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            r = jax.lax.dot_general(
                e.astype(v_slab.dtype), v_slab,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            r = r * inv
            for k in range(g):
                attn_scr[
                    row0 : row0 + n, col + k * dk : col + (k + 1) * dk
                ] = r[k * n : (k + 1) * n, k * dk : (k + 1) * dk].astype(
                    attn_scr.dtype
                )


def _attention_rows_pipelined(
    qkv, attn_scr, bias_ref, mask_ref, *, heads, n, wpb, c, scale
):
    """Software-pipelined per-(window, head) loop (VERDICT r4 item 8): the
    NEXT iteration's score dot (MXU) is emitted BEFORE the previous
    iteration's softmax + value phase (VPU-heavy), a two-deep pipeline that
    gives Mosaic's scheduler an independent MXU op to overlap with each
    VPU-bound softmax instead of the strictly serial
    score->softmax->value->score->... chain. Costs one extra live (n, n)
    f32 score tile. Numerically identical to the perhead loop (same ops,
    same order within each (w, h) — only cross-iteration emission order
    changes, which carries no fp consequence)."""
    dk = c // heads

    def start(w, h):
        row0, col = w * n, h * dk
        q = qkv[row0 : row0 + n, col : col + dk] * scale
        k = qkv[row0 : row0 + n, c + col : c + col + dk]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias_ref[h]
        if mask_ref is not None:
            s = s + mask_ref[w]
        return s

    def finish(w, h, s):
        row0, col = w * n, h * dk
        v = qkv[row0 : row0 + n, 2 * c + col : 2 * c + col + dk]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        ev = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        attn_scr[row0 : row0 + n, col : col + dk] = (
            ev * (1.0 / denom)
        ).astype(attn_scr.dtype)

    order = [(w, h) for w in range(wpb) for h in range(heads)]
    pending = None
    for w, h in order:
        s = start(w, h)
        if pending is not None:
            finish(*pending)
        pending = (w, h, s)
    finish(*pending)


def _attention_rows(
    qkv, attn_scr, bias_ref, mask_ref, *, heads, n, wpb, c, scale,
    packed=False,
):
    """Per-window multi-head attention over flat (wpb*n, 3c) qkv rows, writing
    (wpb*n, c) into attn_scr — shared by the whole-block and attention-half
    kernels."""
    if _INFER_ATTN_ROWS_IMPL == "pipelined" and not packed:
        _attention_rows_pipelined(
            qkv, attn_scr, bias_ref, mask_ref,
            heads=heads, n=n, wpb=wpb, c=c, scale=scale,
        )
        return
    if _INFER_ATTN_ROWS_IMPL == "grouped" and not packed:
        _attention_rows_grouped(
            qkv, attn_scr, bias_ref, mask_ref,
            heads=heads, n=n, wpb=wpb, c=c, scale=scale,
        )
        return
    if packed:
        _attention_rows_packed(
            qkv, attn_scr, bias_ref, mask_ref,
            heads=heads, n=n, wpb=wpb, c=c, scale=scale,
        )
        return
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
            # softmax with the normalization FOLDED PAST the value dot:
            # (e / sum) @ v == (e @ v) * (1 / sum). The divide moves from the
            # lane-padded (n, 256) score matrix to the (n, dk) output — one
            # fewer full-width VPU pass per head (n=144 pads to 256 lanes,
            # so elementwise passes on scores run at 56% lane utilization).
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            ev = jax.lax.dot_general(
                e.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            attn_scr[row0 : row0 + n, col : col + dk] = (
                ev * (1.0 / denom)
            ).astype(attn_scr.dtype)


def _transition_strip(xa_ref, xb_ref, p4_ref, *, W, n, c, dc):
    """Apply the folded shift transition (models/swin.py transition_pieces)
    inside the kernel: the program holds TWO resident source window-rows
    (row r+dr0 in xa, row r+dr1 in xb); each of its W output windows is the
    one-hot product P4 @ vstack(4 source windows) — a (n, 4n)x(4n, c) MXU
    dot selecting rows exactly (one 1.0 term accumulated in fp32 per output
    row). Replaces the XLA-level transpose+gather+transpose chain between
    consecutive blocks (~8 ms/fwd at b32, round-3 profile) with ~0.4 ms of
    MXU work."""
    rowA = xa_ref[:].reshape(W * n, c)
    rowB = xb_ref[:].reshape(W * n, c)
    p4 = p4_ref[:]
    pieces = []
    for j in range(W):
        j0 = (j + dc[0]) % W
        j1 = (j + dc[1]) % W
        src = jnp.concatenate(
            [
                rowA[j0 * n : (j0 + 1) * n],
                rowA[j1 * n : (j1 + 1) * n],
                rowB[j0 * n : (j0 + 1) * n],
                rowB[j1 * n : (j1 + 1) * n],
            ],
            axis=0,
        )
        pieces.append(
            jax.lax.dot_general(
                p4, src, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(rowA.dtype)
        )
    return jnp.concatenate(pieces, axis=0)


def _block_body(
    x,
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
    c = x.shape[-1]

    # ---- attention sublayer -------------------------------------------------
    xn = _ln(x, g1_ref, b1_ref, eps)
    qkv = _linear(xn, wqkv_ref, bqkv_ref)  # (rows, 3c)
    _attention_rows(
        qkv, attn_scr, bias_ref, mask_ref,
        heads=heads, n=n, wpb=wpb, c=c, scale=scale,
        packed=_INFER_ATTN_ROWS_IMPL == "packed",
    )
    x = x + _linear(attn_scr[:], wproj_ref, bproj_ref)

    # ---- MLP sublayer -------------------------------------------------------
    h2 = _ln(x, g2_ref, b2_ref, eps)
    hidden = _linear(h2, wfc1_ref, bfc1_ref)
    hidden = _gelu_exact(hidden.astype(jnp.float32)).astype(hidden.dtype)
    out_ref[:] = (x + _linear(hidden, wfc2_ref, bfc2_ref)).reshape(wpb, n, c)


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
    x = x_ref[:].reshape(wpb * n, c)
    _block_body(
        x, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
        g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
        bias_ref, mask_ref, out_ref, attn_scr,
        heads=heads, n=n, wpb=wpb, scale=scale, eps=eps,
    )


def _block_kernel_trans(
    xa_ref, xb_ref,
    g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    bias_ref,
    mask_ref,
    p4_ref,
    out_ref,
    attn_scr,
    *,
    heads: int,
    n: int,
    W: int,
    dc,
    scale: float,
    eps: float,
):
    c = xa_ref.shape[-1]
    x = _transition_strip(xa_ref, xb_ref, p4_ref, W=W, n=n, c=c, dc=dc)
    _block_body(
        x, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
        g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
        bias_ref, mask_ref, out_ref, attn_scr,
        heads=heads, n=n, wpb=W, scale=scale, eps=eps,
    )


def _block_kernel_trans_no_mask(
    xa_ref, xb_ref,
    g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, wfc1, bfc1, wfc2, bfc2,
    bias_ref, p4_ref, out_ref, attn_scr,
    *, heads, n, W, dc, scale, eps,
):
    _block_kernel_trans(
        xa_ref, xb_ref, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
        wfc1, bfc1, wfc2, bfc2, bias_ref, None, p4_ref, out_ref, attn_scr,
        heads=heads, n=n, W=W, dc=dc, scale=scale, eps=eps,
    )


def _transition_specs(x, p4, transition, n, c, weights, bias, mask, heads):
    """Shared grid/spec construction for the transition-mode kernels: grid is
    one program per (image, output window-row); the program's TWO source
    window-rows are fetched through mod-index maps over the SAME input array
    (rows r+dr0 and r+dr1 of the previous block's window-layout output)."""
    dr, dc, W = transition
    bw = x.shape[0]
    assert bw % (W * W) == 0

    def idx_row(k):
        def f(t):
            b = t // W
            r = jnp.remainder(t % W + dr[k], W)
            return (b * W + r, 0, 0)

        return f

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    in_specs = [
        pl.BlockSpec((W, n, c), idx_row(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((W, n, c), idx_row(1), memory_space=pltpu.VMEM),
        *[const(w.shape) for w in weights],
        const((heads, n, n)),
    ]
    args = [x, x, *weights, bias.astype(jnp.float32)]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (W, n, n), lambda t: (t % W, 0, 0), memory_space=pltpu.VMEM
            )
        )
        args.append(mask.astype(jnp.float32))
    in_specs.append(const((n, 4 * n)))
    args.append(p4.astype(x.dtype))
    grid = (bw // W,)
    out_spec = pl.BlockSpec((W, n, c), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    return grid, in_specs, args, out_spec, W, dc


def _transition_only_kernel(xa_ref, xb_ref, p4_ref, out_ref, *, W, n, c, dc):
    out_ref[:] = _transition_strip(
        xa_ref, xb_ref, p4_ref, W=W, n=n, c=c, dc=dc
    ).reshape(W, n, c)


@functools.partial(jax.jit, static_argnames=("transition",))
def window_transition_fused(
    x: jnp.ndarray, p4: jnp.ndarray, transition: tuple
) -> jnp.ndarray:
    """STANDALONE window-transition permutation as one Pallas kernel: grid of
    one program per (image, output window-row); each program fetches its two
    source window-rows via mod-index maps and emits P4 @ vstack(2x2 source
    windows) one-hot MXU dots (models/swin.py transition_pieces — exact, one
    1.0 term accumulated in fp32 per output row).

    Used by the TRAINING window-resident stage runner, where the transition
    cannot fold into the next block's kernel (the train kernels' custom VJPs
    save the post-transition x): one read + one write of x at ~batch-major
    layout replaces the XLA gather's transpose -> row-gather -> transpose
    chain, and the VJP is the same kernel with the inverse transition."""
    dr, dc, W = transition
    bw, n, c = x.shape
    assert bw % (W * W) == 0

    def idx_row(k):
        def f(t):
            b = t // W
            r = jnp.remainder(t % W + dr[k], W)
            return (b * W + r, 0, 0)

        return f

    in_specs = [
        pl.BlockSpec((W, n, c), idx_row(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((W, n, c), idx_row(1), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 4 * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_transition_only_kernel, W=W, n=n, c=c, dc=dc),
        grid=(bw // W,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (W, n, c), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bw * n * 4 * n * c,
            bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, x, p4.astype(x.dtype))


@functools.partial(
    jax.jit,
    static_argnames=("heads", "num_windows", "scale", "eps", "transition"),
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
    transition: Optional[tuple] = None,
    p4: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x: (B*nW, N, C) window-partitioned block input (pre-rolled when shifted).
    p: the swin block param dict (norm1/attn/norm2/mlp). bias: (H, N, N) fp32
    pre-gathered relative-position bias. mask: (nW, N, N) additive or None.
    Returns the full block output in the same window layout.

    transition/p4: when set ((dr, dc, W) offsets + the (N, 4N) one-hot from
    models/swin.py transition_pieces), x is the PREVIOUS block's output in
    its own shift layout and the kernel applies the inter-block window
    transition itself (MXU one-hot dots over a 2x2 source-window
    neighborhood) before computing the block — no XLA-level relayout ops
    between consecutive blocks."""
    bw, n, c = x.shape
    quantized = "w_q" in p["attn"]["qkv"]

    weights = [
        p["norm1"]["scale"], p["norm1"]["bias"],
        _weight(p["attn"]["qkv"], x.dtype), _bias_of(p["attn"]["qkv"], 3 * c),
        _weight(p["attn"]["proj"], x.dtype), _bias_of(p["attn"]["proj"], c),
        p["norm2"]["scale"], p["norm2"]["bias"],
        _weight(p["mlp"]["fc1"], x.dtype),
        _bias_of(p["mlp"]["fc1"], p["mlp"]["fc1"]["w" if "w" in p["mlp"]["fc1"] else "w_q"].shape[1]),
        _weight(p["mlp"]["fc2"], x.dtype), _bias_of(p["mlp"]["fc2"], c),
    ]
    fc1 = p["mlp"]["fc1"]
    mlp_hidden = (fc1["w"] if "w" in fc1 else fc1["w_q"]).shape[1]
    flops_per_row = 2 * c * (3 * c + c + 2 * mlp_hidden) + 2 * 2 * n * c

    if transition is not None:
        grid, in_specs, args, out_spec, W, dc = _transition_specs(
            x, p4, transition, n, c, weights, bias, mask, heads
        )
        kernel = functools.partial(
            _block_kernel_trans if mask is not None
            else _block_kernel_trans_no_mask,
            heads=heads, n=n, W=W, dc=dc, scale=scale, eps=eps,
        )
        wpb = W
    else:
        wpb = windows_per_program(num_windows, n, c, bw, quantized=quantized)
        grid = (bw // wpb,)
        mask_blocks = num_windows // wpb

        def const(shape):
            return pl.BlockSpec(
                shape, lambda i: tuple(0 for _ in shape),
                memory_space=pltpu.VMEM,
            )

        in_specs = [
            pl.BlockSpec(
                (wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
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
                _no_mask_wrapper, heads=heads, n=n, wpb=wpb, scale=scale,
                eps=eps,
            )
        out_spec = pl.BlockSpec(
            (wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
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


def _attn_half_body(
    x, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias_ref, mask_ref, out_ref, attn_scr,
    *, heads, n, wpb, scale, eps,
):
    c = x.shape[-1]
    xn = _ln(x, g1_ref, b1_ref, eps)
    qkv = _linear(xn, wqkv_ref, bqkv_ref)
    _attention_rows(
        qkv, attn_scr, bias_ref, mask_ref,
        heads=heads, n=n, wpb=wpb, c=c, scale=scale,
        packed=_INFER_ATTN_ROWS_IMPL == "packed",
    )
    out_ref[:] = (x + _linear(attn_scr[:], wproj_ref, bproj_ref)).reshape(
        wpb, n, c
    )


def _attn_half_kernel(
    x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias_ref, mask_ref, out_ref, attn_scr,
    *, heads, n, wpb, scale, eps,
):
    c = x_ref.shape[-1]
    x = x_ref[:].reshape(wpb * n, c)
    _attn_half_body(
        x, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
        bias_ref, mask_ref, out_ref, attn_scr,
        heads=heads, n=n, wpb=wpb, scale=scale, eps=eps,
    )


def _attn_half_kernel_trans(
    xa_ref, xb_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias_ref, mask_ref, p4_ref, out_ref, attn_scr,
    *, heads, n, W, dc, scale, eps,
):
    c = xa_ref.shape[-1]
    x = _transition_strip(xa_ref, xb_ref, p4_ref, W=W, n=n, c=c, dc=dc)
    _attn_half_body(
        x, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
        bias_ref, mask_ref, out_ref, attn_scr,
        heads=heads, n=n, wpb=W, scale=scale, eps=eps,
    )


def _attn_half_trans_no_mask(
    xa_ref, xb_ref, g1, b1, wqkv, bqkv, wproj, bproj, bias_ref, p4_ref,
    out_ref, attn_scr, *, heads, n, W, dc, scale, eps,
):
    _attn_half_kernel_trans(
        xa_ref, xb_ref, g1, b1, wqkv, bqkv, wproj, bproj, bias_ref, None,
        p4_ref, out_ref, attn_scr,
        heads=heads, n=n, W=W, dc=dc, scale=scale, eps=eps,
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
    jax.jit,
    static_argnames=("heads", "num_windows", "scale", "eps", "transition"),
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
    transition: Optional[tuple] = None,
    p4: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x + proj(window_attention(LN1(x))) on window-partitioned x (B*nW, N, C).

    transition/p4: as in swin_block_fused — fold the inter-block window
    transition into this kernel (x is then the previous block's output in
    its own shift layout)."""
    bw, n, c = x.shape

    weights = [
        p["norm1"]["scale"], p["norm1"]["bias"],
        _weight(p["attn"]["qkv"], x.dtype), _bias_of(p["attn"]["qkv"], 3 * c),
        _weight(p["attn"]["proj"], x.dtype), _bias_of(p["attn"]["proj"], c),
    ]

    if transition is not None:
        grid, in_specs, args, out_spec, W, dc = _transition_specs(
            x, p4, transition, n, c, weights, bias, mask, heads
        )
        kernel = functools.partial(
            _attn_half_kernel_trans if mask is not None
            else _attn_half_trans_no_mask,
            heads=heads, n=n, W=W, dc=dc, scale=scale, eps=eps,
        )
        wpb = W
    else:
        wpb = windows_per_program(
            num_windows, n, c, bw, quantized="w_q" in p["attn"]["qkv"]
        )
        grid = (bw // wpb,)
        mask_blocks = num_windows // wpb

        def const(shape):
            return pl.BlockSpec(
                shape, lambda i: tuple(0 for _ in shape),
                memory_space=pltpu.VMEM,
            )

        in_specs = [
            pl.BlockSpec(
                (wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
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
                _attn_half_kernel, heads=heads, n=n, wpb=wpb, scale=scale,
                eps=eps,
            )
        else:
            kernel = functools.partial(
                _attn_half_no_mask, heads=heads, n=n, wpb=wpb, scale=scale,
                eps=eps,
            )
        out_spec = pl.BlockSpec(
            (wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bw, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((wpb * n, c), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=bw * n * (2 * c * 4 * c + 4 * n * c),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=bw * n * heads * n,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _attn_core_kernel(
    qkv_ref, bias_ref, mask_ref, out_ref, attn_scr,
    *, heads, n, wpb, scale,
):
    c3 = qkv_ref.shape[-1]
    qkv = qkv_ref[:].reshape(wpb * n, c3)
    _attention_rows(
        qkv, attn_scr, bias_ref, mask_ref,
        heads=heads, n=n, wpb=wpb, c=c3 // 3, scale=scale,
        packed=_INFER_ATTN_ROWS_IMPL == "packed",
    )
    out_ref[:] = attn_scr[:].reshape(wpb, n, c3 // 3)


def _attn_core_no_mask(
    qkv_ref, bias_ref, out_ref, attn_scr, *, heads, n, wpb, scale,
):
    _attn_core_kernel(
        qkv_ref, bias_ref, None, out_ref, attn_scr,
        heads=heads, n=n, wpb=wpb, scale=scale,
    )


@functools.partial(
    jax.jit, static_argnames=("heads", "num_windows", "scale")
)
def attention_core_fused(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    heads: int,
    num_windows: int,
    scale: float,
) -> jnp.ndarray:
    """Weights-free per-window attention core: qkv is the ALREADY-COMPUTED
    flat projection (B*nW, N, 3C) (cols [q | k | v], per-head dk blocks
    within each), output is the flat pre-proj attention result (B*nW, N, C).

    For stages whose weight set exceeds even the half-kernel VMEM budget
    (Swin-L stage 3, dim 1536: qkv alone is 14 MB bf16), the GEMMs stay in
    XLA but the score/softmax/value chain — which XLA materializes as
    (B, heads, N, N) fp32 HBM tensors (~127 MB at b32/48 heads, measured
    ~1.3 ms/fwd in the round-3 profile) — runs in VMEM per window with the
    same inner loop as the fused block kernels (grouped/perhead/packed)."""
    bw, n, c3 = qkv.shape
    c = c3 // 3
    # strip budget on the qkv rows (3x the x width of the block kernels)
    wpb = _largest_divisor_wpb(num_windows, n, c3, _TARGET_ELEMS)
    mask_blocks = num_windows // wpb

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    in_specs = [
        pl.BlockSpec((wpb, n, c3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const((heads, n, n)),
    ]
    args = [qkv, bias.astype(jnp.float32)]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (wpb, n, n), lambda i: (i % mask_blocks, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask.astype(jnp.float32))
        kernel = functools.partial(
            _attn_core_kernel, heads=heads, n=n, wpb=wpb, scale=scale
        )
    else:
        kernel = functools.partial(
            _attn_core_no_mask, heads=heads, n=n, wpb=wpb, scale=scale
        )
    return pl.pallas_call(
        kernel,
        grid=(bw // wpb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((wpb * n, c), qkv.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=bw * n * 4 * n * c,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
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


def _mlp_rows_per_program(total_rows: int, hidden: int, budget: int = 4_500_000) -> int:
    """Largest divisor of total_rows whose fp32+bf16 hidden fits the budget."""
    cap = max(1, (budget // (6 * hidden)) or 1)
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


# ---------------------------------------------------------------------------
# Training: fused forward + custom-VJP backward for the whole-block stages.
#
# The XLA training path materializes the same ~8 intermediate tensors per
# block that motivated the inference kernel, plus their gradients. Here the
# forward runs the same one-VMEM-pass kernel (extended with the per-image
# stochastic-depth scales the reference applies at train time,
# models/swin_transformer_mod.py:25-40, and emitting the mid-block residual
# x2), and the backward recomputes block internals from (x, x2) in two fused
# kernels — attention-half over window strips, MLP-half over flat rows — in
# the flash-attention style: no attention matrix or MLP hidden state ever
# round-trips HBM. Weight gradients accumulate across the grid into
# constant-index fp32 output blocks (the grid is sequential on TPU).
#
# Eligibility mirrors inference (stages whose weights fit VMEM, Swin-L 0/1)
# plus dense weights and zero attn/proj/MLP dropout — the reference's training
# recipe (train.py:396-398: drop 0, attn_drop 0, drop_path 0.1) satisfies
# this; ineligible configs fall back to the XLA path automatically.
# ---------------------------------------------------------------------------


def _gelu_grad(x):
    """d/dx of exact GeLU in fp32: Phi(x) + x * phi(x)."""
    phi = jnp.exp(-0.5 * x * x) * 0.3989422804014327  # 1/sqrt(2*pi)
    return 0.5 * (1.0 + _erf(x * 0.7071067811865476)) + x * phi


def _ln_stats(x, eps):
    """fp32 LayerNorm stats of x over the last dim: (xhat, rstd)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (xf - mean) * rstd, rstd


def _ln_bwd(dy_n, xhat, rstd, gamma):
    """LayerNorm backward (normalize over last dim, fp32).

    Returns (dx, dgamma (1, c), dbeta (1, c)); dy_n is the grad wrt the LN
    output."""
    dyf = dy_n.astype(jnp.float32)
    g = gamma[:].astype(jnp.float32)
    dgamma = jnp.sum(dyf * xhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dyf, axis=0, keepdims=True)
    dxhat = dyf * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return dx, dgamma, dbeta


def _block_kernel_train(
    x_ref,
    g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    bias_ref,
    m1_ref,  # (1, strips) f32 SMEM (whole array): drop-path scale, attn branch
    m2_ref,  # (1, strips) f32 SMEM (whole array): drop-path scale, MLP branch
    mask_ref,
    out_ref,
    x2_ref,  # out (wpb, n, c): mid-block residual, saved for the backward
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

    xn = _ln(x, g1_ref, b1_ref, eps)
    qkv = _linear(xn, wqkv_ref, bqkv_ref)
    _attention_rows(
        qkv, attn_scr, bias_ref, mask_ref,
        heads=heads, n=n, wpb=wpb, c=c, scale=scale,
    )
    m1 = m1_ref[0, pl.program_id(0)]
    branch = _linear(attn_scr[:], wproj_ref, bproj_ref).astype(jnp.float32)
    x2 = (x.astype(jnp.float32) + m1 * branch).astype(x.dtype)
    x2_ref[:] = x2.reshape(wpb, n, c)

    h2 = _ln(x2, g2_ref, b2_ref, eps)
    hidden = _linear(h2, wfc1_ref, bfc1_ref)
    hidden = _gelu_exact(hidden.astype(jnp.float32)).astype(hidden.dtype)
    m2 = m2_ref[0, pl.program_id(0)]
    mlp = _linear(hidden, wfc2_ref, bfc2_ref).astype(jnp.float32)
    out_ref[:] = (x2.astype(jnp.float32) + m2 * mlp).astype(x.dtype).reshape(
        wpb, n, c
    )


def _block_kernel_train_no_mask(
    x_ref, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, wfc1, bfc1, wfc2, bfc2,
    bias_ref, m1_ref, m2_ref, out_ref, x2_ref, attn_scr, *, heads, n, wpb,
    scale, eps,
):
    _block_kernel_train(
        x_ref, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, wfc1, bfc1, wfc2,
        bfc2, bias_ref, m1_ref, m2_ref, None, out_ref, x2_ref, attn_scr,
        heads=heads, n=n, wpb=wpb, scale=scale, eps=eps,
    )


def _train_weights(p, dtype):
    c_hidden = p["mlp"]["fc1"]["w"].shape[1]
    c = p["attn"]["proj"]["w"].shape[1]
    return [
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["attn"]["qkv"]["w"].astype(dtype), _bias_of(p["attn"]["qkv"], 3 * c),
        p["attn"]["proj"]["w"].astype(dtype), _bias_of(p["attn"]["proj"], c),
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["mlp"]["fc1"]["w"].astype(dtype), _bias_of(p["mlp"]["fc1"], c_hidden),
        p["mlp"]["fc2"]["w"].astype(dtype), _bias_of(p["mlp"]["fc2"], c),
    ]


def _train_fwd_call(x, p, bias, mask, m1, m2, heads, num_windows, scale, eps):
    """Forward pallas_call for training: returns (y, x2). m1/m2: (B,) f32
    per-IMAGE stochastic-depth scales (B = bw // num_windows), expanded HERE
    to the kernel's own strip granularity — correct for any strip size
    because strips never straddle an image (wpb divides num_windows)."""
    bw, n, c = x.shape
    wpb = train_fwd_wpb(num_windows, n, c, bw)
    grid = (bw // wpb,)
    mask_blocks = num_windows // wpb
    m1s = jnp.repeat(m1, mask_blocks)
    m2s = jnp.repeat(m2, mask_blocks)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weights = _train_weights(p, x.dtype)
    in_specs = [
        pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        *[const(w.shape) for w in weights],
        const((heads, n, n)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [x, *weights, bias.astype(jnp.float32), m1s.reshape(1, -1), m2s.reshape(1, -1)]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (wpb, n, n), lambda i: (i % mask_blocks, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask.astype(jnp.float32))
        kernel = functools.partial(
            _block_kernel_train, heads=heads, n=n, wpb=wpb, scale=scale, eps=eps
        )
    else:
        kernel = functools.partial(
            _block_kernel_train_no_mask, heads=heads, n=n, wpb=wpb, scale=scale,
            eps=eps,
        )
    y, x2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bw, n, c), x.dtype),
            jax.ShapeDtypeStruct((bw, n, c), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((wpb * n, c), x.dtype)],
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return y, x2


# ---- MLP-half backward ------------------------------------------------------


def _mlp_bwd_kernel(
    x2_ref,  # (rpp, c)
    dy_ref,  # (rpp, c)
    g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    m2_ref,  # (1, blocks) f32 SMEM (whole array)
    dx2_ref,  # out (rpp, c)
    dw1_ref,  # out (c, hidden) f32, accumulated
    db1_ref,  # out (1, hidden) f32
    dw2_ref,  # out (hidden, c) f32
    db2_ref,  # out (1, c) f32
    dg2_ref,  # out (1, c) f32
    dbe2_ref,  # out (1, c) f32
    *,
    eps: float,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _zero():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dg2_ref[:] = jnp.zeros_like(dg2_ref)
        dbe2_ref[:] = jnp.zeros_like(dbe2_ref)

    x2 = x2_ref[:]
    cd = x2.dtype
    # recompute the forward internals (dtype discipline mirrors the fwd kernel)
    xhat, rstd = _ln_stats(x2, eps)
    xn2 = (xhat * g2_ref[:] + b2_ref[:]).astype(cd)
    h1 = jnp.dot(
        xn2, wfc1_ref[:].astype(cd), preferred_element_type=jnp.float32
    ) + bfc1_ref[:].astype(jnp.float32)
    g = _gelu_exact(h1).astype(cd)

    m2 = m2_ref[0, pl.program_id(0)]
    dmlp = (dy_ref[:].astype(jnp.float32) * m2).astype(cd)
    dw2_ref[:] += jax.lax.dot_general(
        g, dmlp, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[:] += jnp.sum(dmlp.astype(jnp.float32), axis=0, keepdims=True)
    dg = jax.lax.dot_general(
        dmlp, wfc2_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rpp, hidden)
    dh1 = (dg * _gelu_grad(h1)).astype(cd)
    dw1_ref[:] += jax.lax.dot_general(
        xn2, dh1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[:] += jnp.sum(dh1.astype(jnp.float32), axis=0, keepdims=True)
    dxn2 = jax.lax.dot_general(
        dh1, wfc1_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rpp, c)
    dx2_ln, dgamma, dbeta = _ln_bwd(dxn2, xhat, rstd, g2_ref)
    dg2_ref[:] += dgamma
    dbe2_ref[:] += dbeta
    dx2_ref[:] = (dy_ref[:].astype(jnp.float32) + dx2_ln).astype(dx2_ref.dtype)


def _mlp_bwd_emit_kernel(
    x2_ref,  # (rpp, c)
    dy_ref,  # (rpp, c)
    g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    m2_ref,  # (1, blocks) f32 SMEM
    dx2_ref,  # out (rpp, c)
    dg2_ref,  # out (1, c) f32 accumulated
    dbe2_ref,  # out (1, c) f32
    xn2_ref,  # out (rpp, c) cd — LN2 rows (dW1 operand)
    g_ref,  # out (rpp, hidden) cd — GeLU rows (dW2 operand)
    dh1_ref,  # out (rpp, hidden) cd — hidden grads
    *,
    eps: float,
):
    """Emit variant of _mlp_bwd_kernel (see _attn_bwd_emit_kernel): at
    stage-2 size the f32 dW1/dW2 accumulators (9.4 MB each) blow scoped VMEM
    beside the 9.4 MB of bf16 weights (observed 18.00M vs the 16M budget);
    emit the per-row GEMM operands and form dW1/dW2 outside as XLA GEMMs."""
    x2 = x2_ref[:]
    cd = x2.dtype
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _zero():
        dg2_ref[:] = jnp.zeros_like(dg2_ref)
        dbe2_ref[:] = jnp.zeros_like(dbe2_ref)

    xhat, rstd = _ln_stats(x2, eps)
    xn2 = (xhat * g2_ref[:] + b2_ref[:]).astype(cd)
    xn2_ref[:] = xn2
    h1 = jnp.dot(
        xn2, wfc1_ref[:].astype(cd), preferred_element_type=jnp.float32
    ) + bfc1_ref[:].astype(jnp.float32)
    g = _gelu_exact(h1).astype(cd)
    g_ref[:] = g

    m2 = m2_ref[0, pl.program_id(0)]
    dmlp = (dy_ref[:].astype(jnp.float32) * m2).astype(cd)
    dg = jax.lax.dot_general(
        dmlp, wfc2_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rpp, hidden)
    dh1 = (dg * _gelu_grad(h1)).astype(cd)
    dh1_ref[:] = dh1
    dxn2 = jax.lax.dot_general(
        dh1, wfc1_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rpp, c)
    dx2_ln, dgamma, dbeta = _ln_bwd(dxn2, xhat, rstd, g2_ref)
    dg2_ref[:] += dgamma
    dbe2_ref[:] += dbeta
    dx2_ref[:] = (dy_ref[:].astype(jnp.float32) + dx2_ln).astype(dx2_ref.dtype)


def _mlp_bwd_call_emit(x2, dy, p, m2_rows, eps, rpp):
    """Emit-variant driver with _mlp_bwd_call's return signature."""
    rows, c = x2.shape
    hidden = p["mlp"]["fc1"]["w"].shape[1]
    cd = x2.dtype

    def const(shape):
        return pl.BlockSpec(
            shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weights = [
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["mlp"]["fc1"]["w"].astype(cd), _bias_of(p["mlp"]["fc1"], hidden),
        p["mlp"]["fc2"]["w"].astype(cd), _bias_of(p["mlp"]["fc2"], c),
    ]
    dx2, dg2, dbe2, xn2_r, g_r, dh1_r = pl.pallas_call(
        functools.partial(_mlp_bwd_emit_kernel, eps=eps),
        grid=(rows // rpp,),
        in_specs=[
            pl.BlockSpec((rpp, c), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rpp, c), lambda j: (j, 0), memory_space=pltpu.VMEM),
            *[const(w.shape) for w in weights],
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((rpp, c), lambda j: (j, 0), memory_space=pltpu.VMEM),
            const((1, c)), const((1, c)),
            pl.BlockSpec((rpp, c), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rpp, hidden), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rpp, hidden), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c), cd),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((rows, c), cd),
            jax.ShapeDtypeStruct((rows, hidden), cd),
            jax.ShapeDtypeStruct((rows, hidden), cd),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x2, dy, *weights, m2_rows.reshape(1, -1))

    # per-row drop-path scale: m2_rows holds one scalar per rpp-row block
    m2_per_row = jnp.repeat(m2_rows, rpp, axis=0)  # (rows, 1)
    dmlp = (dy.astype(jnp.float32) * m2_per_row).astype(cd)
    dw2 = jax.lax.dot_general(
        g_r, dmlp, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2 = jnp.sum(dmlp.astype(jnp.float32), axis=0, keepdims=True)
    dw1 = jax.lax.dot_general(
        xn2_r, dh1_r, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1 = jnp.sum(dh1_r.astype(jnp.float32), axis=0, keepdims=True)
    return dx2, dw1, db1, dw2, db2, dg2, dbe2


def _mlp_bwd_resident_bytes(c: int, hidden: int, itemsize: int) -> int:
    """Scoped-VMEM resident estimate of the ACCUMULATING MLP backward:
    bf16 weights + f32 dW accumulators."""
    return 2 * c * hidden * itemsize + 2 * c * hidden * 4


def _mlp_bwd_dispatch(x2, dy, p, m2_rows, eps, rpp):
    hidden = p["mlp"]["fc1"]["w"].shape[1]
    resident = _mlp_bwd_resident_bytes(
        x2.shape[1], hidden, jnp.dtype(x2.dtype).itemsize
    )
    call = _mlp_bwd_call_emit if resident > 11 * 1024 * 1024 else _mlp_bwd_call
    return call(x2, dy, p, m2_rows, eps, rpp)


def _mlp_bwd_call(x2, dy, p, m2_rows, eps, rpp):
    rows, c = x2.shape
    hidden = p["mlp"]["fc1"]["w"].shape[1]

    def const(shape):
        return pl.BlockSpec(
            shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weights = [
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["mlp"]["fc1"]["w"].astype(x2.dtype), _bias_of(p["mlp"]["fc1"], hidden),
        p["mlp"]["fc2"]["w"].astype(x2.dtype), _bias_of(p["mlp"]["fc2"], c),
    ]
    acc = lambda shape: pl.BlockSpec(
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps),
        grid=(rows // rpp,),
        in_specs=[
            pl.BlockSpec((rpp, c), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rpp, c), lambda j: (j, 0), memory_space=pltpu.VMEM),
            *[const(w.shape) for w in weights],
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((rpp, c), lambda j: (j, 0), memory_space=pltpu.VMEM),
            acc((c, hidden)), acc((1, hidden)), acc((hidden, c)), acc((1, c)),
            acc((1, c)), acc((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c), x2.dtype),
            jax.ShapeDtypeStruct((c, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x2, dy, *weights, m2_rows.reshape(1, -1))
    return outs


# ---- attention-half backward -------------------------------------------------


def _attn_bwd_kernel(
    x_ref,  # (wpb, n, c)
    dx2_ref,  # (wpb, n, c) grad wrt the mid-block residual
    g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias_ref,  # (H, n, n) f32
    m1_ref,  # (1, strips) f32 SMEM (whole array)
    mask_ref,  # (wpb, n, n) f32 or None
    dx_ref,  # out (wpb, n, c)
    dwqkv_ref,  # out (c, 3c) f32 accumulated
    dbqkv_ref,  # out (1, 3c) f32
    dwproj_ref,  # out (c, c) f32
    dbproj_ref,  # out (1, c) f32
    dg1_ref,  # out (1, c) f32
    dbe1_ref,  # out (1, c) f32
    dbias_ref,  # out (H, n, n) f32
    attn_scr,  # scratch (wpb*n, c) cd
    dqkv_scr,  # scratch (wpb*n, 3c) f32
    *,
    heads: int,
    n: int,
    wpb: int,
    scale: float,
    eps: float,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:] = jnp.zeros_like(dbproj_ref)
        dg1_ref[:] = jnp.zeros_like(dg1_ref)
        dbe1_ref[:] = jnp.zeros_like(dbe1_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    c = x_ref.shape[-1]
    dk = c // heads
    rows = wpb * n
    x = x_ref[:].reshape(rows, c)
    cd = x.dtype

    # recompute forward internals
    xhat, rstd = _ln_stats(x, eps)
    xn1 = (xhat * g1_ref[:] + b1_ref[:]).astype(cd)
    qkv = _linear(xn1, wqkv_ref, bqkv_ref)  # (rows, 3c) cd
    _attention_rows(
        qkv, attn_scr, bias_ref, mask_ref,
        heads=heads, n=n, wpb=wpb, c=c, scale=scale,
    )

    m1 = m1_ref[0, pl.program_id(0)]
    dx2 = dx2_ref[:].reshape(rows, c).astype(jnp.float32)
    dproj = (dx2 * m1).astype(cd)
    dbproj_ref[:] += jnp.sum(dproj.astype(jnp.float32), axis=0, keepdims=True)
    dwproj_ref[:] += jax.lax.dot_general(
        attn_scr[:], dproj, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dao = jax.lax.dot_general(
        dproj, wproj_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, c) f32

    # per-window, per-head attention backward (recompute S and P). Dots run
    # on COMPUTE-DTYPE operands with f32 accumulation — the same discipline
    # as the forward _attention_rows at these shapes (the all-f32 variant
    # matched f32-mode parity but ran the MXU at half rate in bf16 training:
    # stage-2 attn bwd measured ~2x its FLOP-time, i.e. f32-MXU-bound).
    # In f32 mode cd == f32, so grad-parity numerics are unchanged.
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
            p = jax.nn.softmax(s, axis=-1)  # (n, n) f32
            p_cd = p.astype(cd)
            dao_h = dao[row0 : row0 + n, col : col + dk].astype(cd)
            dp = jax.lax.dot_general(
                dao_h, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_ref[h] += ds
            ds_cd = ds.astype(cd)
            dq = jax.lax.dot_general(
                ds_cd, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dk_ = jax.lax.dot_general(
                ds_cd, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv = jax.lax.dot_general(
                p_cd, dao_h, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_scr[row0 : row0 + n, col : col + dk] = dq
            dqkv_scr[row0 : row0 + n, c + col : c + col + dk] = dk_
            dqkv_scr[row0 : row0 + n, 2 * c + col : 2 * c + col + dk] = dv

    dqkv = dqkv_scr[:]
    dbqkv_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
    dqkv_cd = dqkv.astype(cd)
    dwqkv_ref[:] += jax.lax.dot_general(
        xn1, dqkv_cd,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dxn1 = jax.lax.dot_general(
        dqkv_cd, wqkv_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, c)
    dx_ln, dgamma, dbeta = _ln_bwd(dxn1, xhat, rstd, g1_ref)
    dg1_ref[:] += dgamma
    dbe1_ref[:] += dbeta
    dx_ref[:] = (dx2 + dx_ln).astype(dx_ref.dtype).reshape(wpb, n, c)


def _attn_bwd_no_mask(
    x_ref, dx2_ref, g1, b1, wqkv, bqkv, wproj, bproj, bias_ref, m1_ref,
    dx_ref, dwqkv, dbqkv, dwproj, dbproj, dg1, dbe1, dbias, attn_scr,
    dqkv_scr, *, heads, n, wpb, scale, eps,
):
    _attn_bwd_kernel(
        x_ref, dx2_ref, g1, b1, wqkv, bqkv, wproj, bproj, bias_ref, m1_ref,
        None, dx_ref, dwqkv, dbqkv, dwproj, dbproj, dg1, dbe1, dbias,
        attn_scr, dqkv_scr, heads=heads, n=n, wpb=wpb, scale=scale, eps=eps,
    )


def _attn_bwd_emit_kernel(
    x_ref, dx2_ref, g1_ref, b1_ref, wqkv3_ref, bqkv3_ref, wprojr_ref,
    bias_ref, m1_ref, *rest,
    heads_g: int, n: int, wpb: int, scale: float, eps: float,
    has_mask: bool, emit_xn1: bool,
):
    """Head-sliced emit backward for stages whose f32 rel-bias tensor and its
    gradient accumulator can't BOTH sit in scoped VMEM beside the weights.

    At Swin-L stage 2 (c=768, heads=24, n=144) the bias and dbias are
    7.96 MB EACH in f32; together with the 4.7 MB bf16 qkv/proj weights a
    whole-heads kernel needs ~20 MB of scoped VMEM against the 16 MB budget
    (measured: fresh compile of the b16 XE step fails at 20.03M — the
    earlier all-heads emit variant only ever ran from stale compile-cache
    entries). This kernel therefore handles one SLICE of heads_g heads per
    pallas_call: the caller pre-slices the qkv weight (viewed as (c, 3, c))
    and the proj rows so the per-slice GEMMs are an exact split of the full
    ones (no redundant FLOPs), and runs G sequential calls. What no longer
    fits in-kernel moves to XLA over the emitted rows: dxn1 (one big GEMM
    over the concatenated dqkv slices), the LayerNorm backward, and the
    weight/bias grads (same emit-GEMM scheme as before).

    Per slice the kernel recomputes LN1 + its qkv slab + the attention
    forward/backward for its heads (flash-style, from the saved x), emits
    the forward attention rows (dWproj operand) and per-row dqkv grads, and
    accumulates the bias gradient for its heads across the strip grid.
    Recomputed-per-slice work (LN, dproj scaling) is O(rows*c) VPU — noise
    next to the GEMMs. Reference semantics: the backward of
    models/swin_transformer_mod.py:222-272's WindowAttention."""
    rest = list(rest)
    mask_ref = rest.pop(0) if has_mask else None
    dbias_ref = rest.pop(0)
    xn1_ref = rest.pop(0) if emit_xn1 else None
    attn_ref = rest.pop(0)
    dqkv3_ref = rest.pop(0)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    c = x_ref.shape[-1]
    chg = wprojr_ref.shape[0]  # heads_g * dk
    dk = chg // heads_g
    rows = wpb * n
    x = x_ref[:].reshape(rows, c)
    cd = x.dtype

    # recompute forward internals (same discipline as _attn_bwd_kernel)
    xhat, _ = _ln_stats(x, eps)
    xn1 = (xhat * g1_ref[:] + b1_ref[:]).astype(cd)
    if emit_xn1:
        xn1_ref[:] = xn1.reshape(wpb, n, c)

    wslab = wqkv3_ref[:]  # (c, 3, chg)
    bslab = bqkv3_ref[:].astype(jnp.float32)  # (3, chg)

    def part(j):
        y = jnp.dot(
            xn1, wslab[:, j, :].astype(cd), preferred_element_type=jnp.float32
        )
        return (y + bslab[j]).astype(cd)

    qg, kg, vg = part(0), part(1), part(2)  # (rows, chg) each

    m1 = m1_ref[0, pl.program_id(0)]
    dx2 = dx2_ref[:].reshape(rows, c).astype(jnp.float32)
    dproj = (dx2 * m1).astype(cd)
    dao = jax.lax.dot_general(
        dproj, wprojr_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, chg) f32

    for w in range(wpb):
        row0 = w * n
        for h in range(heads_g):
            col = h * dk
            q = qg[row0 : row0 + n, col : col + dk] * scale
            k = kg[row0 : row0 + n, col : col + dk]
            v = vg[row0 : row0 + n, col : col + dk]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + bias_ref[h]
            if mask_ref is not None:
                s = s + mask_ref[w]
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            inv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            p = e * inv  # softmax (n, n) f32
            p_cd = p.astype(cd)
            # forward attention rows (the dWproj GEMM operand), in the same
            # folded form as the forward kernels' _attention_rows
            ev = jax.lax.dot_general(
                e.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            attn_ref[w, :, col : col + dk] = (ev * inv).astype(cd)
            dao_h = dao[row0 : row0 + n, col : col + dk].astype(cd)
            dp = jax.lax.dot_general(
                dao_h, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_ref[h] += ds
            ds_cd = ds.astype(cd)
            dq = jax.lax.dot_general(
                ds_cd, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dk_ = jax.lax.dot_general(
                ds_cd, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv = jax.lax.dot_general(
                p_cd, dao_h, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv3_ref[w, :, col : col + dk] = dq.astype(cd)
            dqkv3_ref[w, :, chg + col : chg + col + dk] = dk_.astype(cd)
            dqkv3_ref[w, :, 2 * chg + col : 2 * chg + col + dk] = dv.astype(cd)


def _attn_bwd_resident_bytes(c: int, heads: int, n: int, itemsize: int) -> int:
    """Scoped-VMEM resident estimate of the ACCUMULATING backward kernel:
    bf16 weights + f32 dW accumulators + f32 bias/dbias."""
    weights = (c * 3 * c + c * c) * itemsize
    accums = (c * 3 * c + c * c) * 4
    return weights + accums + 2 * heads * n * n * 4


def _emit_groups(heads: int, n: int, c: int, wpb: int, itemsize: int) -> int:
    """Fewest head slices G (a divisor of heads) whose per-call scoped-VMEM
    resident estimate fits the budget. Dominant terms per slice: the f32
    bias block + its f32 dbias accumulator, the sliced weight slabs, and the
    double-buffered strip blocks. Stage-2 Swin-L (heads=24) lands on G=3."""
    budget = 13 * 1024 * 1024
    dk = c // heads
    # Mosaic stack-allocates the PER-UNROLLED-HEAD f32 temporaries of the
    # attention backward (s, e, p, ds, dp, ...) at lane-padded width instead
    # of fully reusing their slots. Measured scoped-VMEM at stage-2 size
    # (c=768, n=144) inside the real XE step: 24 resident heads 25.70M,
    # 12 heads 17.23M, 8 heads compiles — so ~0.7 MB/head of stack temps on
    # top of the block set (a standalone pallas_call of the same shape
    # compiles at 12 heads; the step's surrounding scan costs ~1 MB more).
    # Budget 6 lane-padded (n, n) f32 arrays per unrolled (window, head)
    # iteration against a conservative 13M, which lands stage 2 on G=3.
    lanes = ((n + 127) // 128) * 128
    for g in range(1, heads + 1):
        if heads % g:
            continue
        hg = heads // g
        chg = hg * dk
        bias_b = 2 * hg * n * n * 4
        w_b = (3 * c * chg + chg * c) * itemsize
        strip_b = 2 * wpb * n * (
            2 * c * itemsize  # x, dx2 strips in
            + c * itemsize  # xn1 strip out
            + 4 * chg * itemsize  # attn + dqkv3 strips out
        )
        temps_b = hg * wpb * n * lanes * 4 * 6
        if bias_b + w_b + strip_b + temps_b + (1 << 20) <= budget:
            return g
    return heads


def _attn_bwd_call_emit(
    x, dx2, p, bias, mask, m1s, heads, num_windows, scale, eps, wpb,
    force_groups=None,
):
    """Emit-variant driver: returns (dx, dwqkv, dbqkv, dwproj, dbproj, dg1,
    dbe1, dbias) like _attn_bwd_call, running G head-sliced kernels (see
    _attn_bwd_emit_kernel) and forming dxn1, the LN backward, and the
    weight grads as XLA GEMMs over the kernel-emitted rows."""
    bw, n, c = x.shape
    cd = x.dtype
    mask_blocks = num_windows // wpb
    itemsize = jnp.dtype(cd).itemsize
    G = force_groups or _emit_groups(heads, n, c, wpb, itemsize)
    assert heads % G == 0, (heads, G)
    hg = heads // G
    chg = hg * (c // heads)

    wqkv_w = p["attn"]["qkv"]["w"]
    wqkv3 = wqkv_w.astype(cd).reshape(c, 3, c)
    bqkv3 = _bias_of(p["attn"]["qkv"], 3 * c).reshape(3, c)
    wproj = p["attn"]["proj"]["w"].astype(cd)
    bias_f = bias.astype(jnp.float32)
    mask_f = None if mask is None else mask.astype(jnp.float32)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    def strip(last):
        return pl.BlockSpec(
            (wpb, n, last), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    dbias_sl, attn_sl, dqkv_sl = [], [], []
    xn1_r = None
    for g in range(G):
        hsl = slice(g * hg, (g + 1) * hg)
        csl = slice(g * chg, (g + 1) * chg)
        emit_xn1 = g == 0
        args = [
            x, dx2, p["norm1"]["scale"], p["norm1"]["bias"],
            wqkv3[:, :, csl], bqkv3[:, csl], wproj[csl, :], bias_f[hsl],
            m1s.reshape(1, -1),
        ]
        in_specs = [
            strip(c), strip(c), const((c,)), const((c,)),
            const((c, 3, chg)), const((3, chg)), const((chg, c)),
            const((hg, n, n)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        if mask_f is not None:
            in_specs.append(
                pl.BlockSpec(
                    (wpb, n, n), lambda i: (i % mask_blocks, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            args.append(mask_f)
        out_specs = [const((hg, n, n))]
        out_shape = [jax.ShapeDtypeStruct((hg, n, n), jnp.float32)]
        if emit_xn1:
            out_specs.append(strip(c))
            out_shape.append(jax.ShapeDtypeStruct((bw, n, c), cd))
        out_specs += [strip(chg), strip(3 * chg)]
        out_shape += [
            jax.ShapeDtypeStruct((bw, n, chg), cd),
            jax.ShapeDtypeStruct((bw, n, 3 * chg), cd),
        ]
        kernel = functools.partial(
            _attn_bwd_emit_kernel, heads_g=hg, n=n, wpb=wpb, scale=scale,
            eps=eps, has_mask=mask_f is not None, emit_xn1=emit_xn1,
        )
        outs = list(
            pl.pallas_call(
                kernel,
                grid=(bw // wpb,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                interpret=jax.default_backend() != "tpu",
            )(*args)
        )
        dbias_sl.append(outs.pop(0))
        if emit_xn1:
            xn1_r = outs.pop(0)
        attn_sl.append(outs.pop(0))
        dqkv_sl.append(outs.pop(0))

    dbias = jnp.concatenate(dbias_sl, axis=0) if G > 1 else dbias_sl[0]
    rows = bw * n
    xn1_f = xn1_r.reshape(rows, c)
    attn_f = (
        jnp.concatenate(attn_sl, axis=-1) if G > 1 else attn_sl[0]
    ).reshape(rows, c)
    # each slice emits [dq_g | dk_g | dv_g] on its last dim; regroup to the
    # original qkv column order [dq(c) | dk(c) | dv(c)]
    if G > 1:
        dqkv3 = jnp.concatenate(
            [
                jnp.concatenate(
                    [sl[:, :, j * chg : (j + 1) * chg] for sl in dqkv_sl],
                    axis=-1,
                )
                for j in range(3)
            ],
            axis=-1,
        )
    else:
        dqkv3 = dqkv_sl[0]
    dqkv_f = dqkv3.reshape(rows, 3 * c)

    # dxn1 and the LayerNorm backward run in XLA over the emitted rows
    dxn1 = jax.lax.dot_general(
        dqkv_f, wqkv_w.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, c) f32
    xhat, rstd = _ln_stats(x.reshape(rows, c), eps)
    dx_ln, dg1, dbe1 = _ln_bwd(dxn1, xhat, rstd, p["norm1"]["scale"])
    dx = (
        (dx2.reshape(rows, c).astype(jnp.float32) + dx_ln)
        .astype(cd)
        .reshape(bw, n, c)
    )

    # per-row drop-path scale: m1s is per backward strip of wpb windows
    m1_rows = jnp.repeat(m1s, wpb * n, axis=0)  # (rows, 1)
    dproj = (dx2.reshape(rows, c).astype(jnp.float32) * m1_rows).astype(cd)
    dwqkv = jax.lax.dot_general(
        xn1_f, dqkv_f, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv = jnp.sum(dqkv_f.astype(jnp.float32), axis=0, keepdims=True)
    dwproj = jax.lax.dot_general(
        attn_f, dproj, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbproj = jnp.sum(dproj.astype(jnp.float32), axis=0, keepdims=True)
    return dx, dwqkv, dbqkv, dwproj, dbproj, dg1, dbe1, dbias


def _attn_bwd_dispatch(
    x, dx2, p, bias, mask, m1s, heads, num_windows, scale, eps, wpb
):
    """Route the attention-half backward: in-kernel dW accumulation when the
    resident set fits scoped VMEM (stages 0/1), the emit variant otherwise
    (stage 2 — see _attn_bwd_emit_kernel)."""
    _, n, c = x.shape
    resident = _attn_bwd_resident_bytes(
        c, heads, n, jnp.dtype(x.dtype).itemsize
    )
    call = _attn_bwd_call_emit if resident > 11 * 1024 * 1024 else _attn_bwd_call
    return call(x, dx2, p, bias, mask, m1s, heads, num_windows, scale, eps, wpb)


def _attn_bwd_call(x, dx2, p, bias, mask, m1s, heads, num_windows, scale, eps, wpb):
    bw, n, c = x.shape
    mask_blocks = num_windows // wpb

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weights = [
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["attn"]["qkv"]["w"].astype(x.dtype), _bias_of(p["attn"]["qkv"], 3 * c),
        p["attn"]["proj"]["w"].astype(x.dtype), _bias_of(p["attn"]["proj"], c),
    ]
    strip = lambda: pl.BlockSpec(
        (wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        strip(), strip(),
        *[const(w.shape) for w in weights],
        const((heads, n, n)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [x, dx2, *weights, bias.astype(jnp.float32), m1s.reshape(1, -1)]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (wpb, n, n), lambda i: (i % mask_blocks, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask.astype(jnp.float32))
        kernel = functools.partial(
            _attn_bwd_kernel, heads=heads, n=n, wpb=wpb, scale=scale, eps=eps
        )
    else:
        kernel = functools.partial(
            _attn_bwd_no_mask, heads=heads, n=n, wpb=wpb, scale=scale, eps=eps
        )
    outs = pl.pallas_call(
        kernel,
        grid=(bw // wpb,),
        in_specs=in_specs,
        out_specs=[
            strip(),
            const((c, 3 * c)), const((1, 3 * c)), const((c, c)), const((1, c)),
            const((1, c)), const((1, c)), const((heads, n, n)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bw, n, c), x.dtype),
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((heads, n, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((wpb * n, c), x.dtype),
            pltpu.VMEM((wpb * n, 3 * c), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return outs


# ---- custom-VJP glue ----------------------------------------------------------


def _bwd_wpb(num_windows: int, n: int, c: int, total_windows: int) -> int:
    """Strip size for the backward kernel: half the forward target (the bwd
    holds fp32 dqkv scratch + fp32 weight-grad accumulators beside the
    weights). Long grids get a quarter target: Mosaic pipelines their DMA
    deeper, and the per-unrolled-(window, head) stack temporaries scale
    with wpb — measured: stage-1 b32 (bw=512, wpb=2) overflows scoped VMEM
    by 1 MB on a fresh compile, wpb=1 fits; b24 (bw=384, wpb=2) fits."""
    target = (_TARGET_ELEMS // 2) if total_windows < 512 else (_TARGET_ELEMS // 4)
    return _largest_divisor_wpb(num_windows, n, c, target)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def swin_block_fused_train(x, p, bias, mask, m1, m2, heads, num_windows, scale, eps):
    """Differentiable fused Swin block for training (stages whose weights fit
    VMEM). x: (B*nW, n, c) window-partitioned input; p: DENSE block params;
    bias: (H, n, n) materialized relative-position bias (its table gradient
    flows through the caller's gather); mask: (nW, n, n) shift mask or None;
    m1/m2: (B,) f32 per-IMAGE stochastic-depth scales (0 or 1/keep —
    reference models/swin_transformer_mod.py:25-40, where B = bw //
    num_windows). Per-image granularity IS the drop-path contract; taking
    the scales at that granularity (instead of the former per-forward-strip
    arrays) makes a per-strip-varying scale inexpressible — forward and
    backward each expand to their own independent strip size exactly
    (strips never straddle an image). Returns the block output; the VJP
    recomputes internals in two fused kernels (attention-half over window
    strips, MLP-half over flat rows) from the saved (x, x2)."""
    _check_per_image_scales(x, num_windows, m1, m2)
    y, _ = _train_fwd_call(x, p, bias, mask, m1, m2, heads, num_windows, scale, eps)
    return y


def _check_per_image_scales(x, num_windows, *scales):
    b = x.shape[0] // num_windows
    for m in scales:
        if m.shape != (b,):
            raise ValueError(
                "stochastic-depth scales must be per-image (B,) ="
                f" ({b},); got {m.shape}. Strip-granular scales violate the"
                " drop-path contract (constant per image) and are no longer"
                " representable."
            )


def _train_fwd_rule(x, p, bias, mask, m1, m2, heads, num_windows, scale, eps):
    y, x2 = _train_fwd_call(x, p, bias, mask, m1, m2, heads, num_windows, scale, eps)
    return y, (x, x2, p, bias, mask, m1, m2)


def _train_bwd_rule(heads, num_windows, scale, eps, res, dy):
    x, x2, p, bias, mask, m1, m2 = res
    bw, n, c = x.shape
    rows = bw * n
    # MLP half over flat rows; rpp must divide rows AND keep row blocks
    # within one image so the per-image m2 scalar is constant over a block
    rows_per_image = num_windows * n
    hidden = p["mlp"]["fc1"]["w"].shape[1]
    # half the inference budget: the bwd holds fp32 dg/h1 temps + fp32
    # weight-grad accumulators beside the weights
    rpp = _mlp_rows_per_program(rows_per_image, hidden, budget=2_200_000)
    m2_rows = jnp.repeat(m2, rows_per_image // rpp)[:, None]
    dx2_flat, dw1, db1, dw2, db2, dg2, dbe2 = _mlp_bwd_dispatch(
        x2.reshape(rows, c), dy.reshape(rows, c), p, m2_rows, eps, rpp
    )
    wpb = _bwd_wpb(num_windows, n, c, bw)
    # m1 is per image, so expanding to the backward's own strip size is
    # exact regardless of the (independent) forward strip size
    m1_bwd = jnp.repeat(m1, num_windows // wpb)[:, None]
    dx, dwqkv, dbqkv, dwproj, dbproj, dg1, dbe1, dbias = _attn_bwd_dispatch(
        x, dx2_flat.reshape(bw, n, c), p, bias, mask, m1_bwd,
        heads, num_windows, scale, eps, wpb,
    )
    def lin_grad(node, dw, db):
        g = {"w": dw}
        if "b" in node:
            g["b"] = db[0]
        return g

    dp = {
        "norm1": {"scale": dg1[0], "bias": dbe1[0]},
        "attn": {
            "qkv": lin_grad(p["attn"]["qkv"], dwqkv, dbqkv),
            "proj": lin_grad(p["attn"]["proj"], dwproj, dbproj),
        },
        "norm2": {"scale": dg2[0], "bias": dbe2[0]},
        "mlp": {
            "fc1": lin_grad(p["mlp"]["fc1"], dw1, db1),
            "fc2": lin_grad(p["mlp"]["fc2"], dw2, db2),
        },
    }
    # cast param grads to the param dtypes (params are typically f32 masters);
    # dp's structure mirrors p exactly, so a joint tree.map is valid
    dp = jax.tree.map(lambda g, v: g.astype(v.dtype), dp, p)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (
        dx, dp, dbias.astype(bias.dtype), dmask,
        jnp.zeros_like(m1), jnp.zeros_like(m2),
    )


swin_block_fused_train.defvjp(_train_fwd_rule, _train_bwd_rule)


# ---------------------------------------------------------------------------
# Standalone HALF-block training (stages whose full weight set exceeds VMEM —
# Swin-L stage 2). The forward halves mirror the inference half kernels plus
# the per-strip stochastic-depth scale; the backwards REUSE the full-block
# VJP's flash-style kernels (_attn_bwd_call / _mlp_bwd_call) unchanged.
# ---------------------------------------------------------------------------


def _attn_half_kernel_train(
    x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias_ref, m1_ref, mask_ref, out_ref, attn_scr,
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
    m1 = m1_ref[0, pl.program_id(0)]
    branch = _linear(attn_scr[:], wproj_ref, bproj_ref).astype(jnp.float32)
    out_ref[:] = (x.astype(jnp.float32) + m1 * branch).astype(x.dtype).reshape(
        wpb, n, c
    )


def _attn_half_train_no_mask(
    x_ref, g1, b1, wqkv, bqkv, wproj, bproj, bias_ref, m1_ref, out_ref,
    attn_scr, *, heads, n, wpb, scale, eps,
):
    _attn_half_kernel_train(
        x_ref, g1, b1, wqkv, bqkv, wproj, bproj, bias_ref, m1_ref, None,
        out_ref, attn_scr, heads=heads, n=n, wpb=wpb, scale=scale, eps=eps,
    )


def _attn_half_train_fwd_call(x, p, bias, mask, m1, heads, num_windows, scale, eps):
    bw, n, c = x.shape
    wpb = train_fwd_wpb(num_windows, n, c, bw)
    mask_blocks = num_windows // wpb
    # m1: (B,) per-image scales -> per-strip (see _train_fwd_call)
    m1s = jnp.repeat(m1, mask_blocks)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weights = [
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["attn"]["qkv"]["w"].astype(x.dtype), _bias_of(p["attn"]["qkv"], 3 * c),
        p["attn"]["proj"]["w"].astype(x.dtype), _bias_of(p["attn"]["proj"], c),
    ]
    in_specs = [
        pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        *[const(w.shape) for w in weights],
        const((heads, n, n)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [x, *weights, bias.astype(jnp.float32), m1s.reshape(1, -1)]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (wpb, n, n), lambda i: (i % mask_blocks, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask.astype(jnp.float32))
        kernel = functools.partial(
            _attn_half_kernel_train, heads=heads, n=n, wpb=wpb, scale=scale,
            eps=eps,
        )
    else:
        kernel = functools.partial(
            _attn_half_train_no_mask, heads=heads, n=n, wpb=wpb, scale=scale,
            eps=eps,
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
        interpret=jax.default_backend() != "tpu",
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def swin_attn_half_fused_train(x, p, bias, mask, m1, heads, num_windows, scale, eps):
    """Differentiable x + m1*proj(window_attention(LN1(x))) for stages whose
    attention-half weights fit VMEM but the full block set doesn't. x:
    (B*nW, n, c) window-partitioned; p: {'norm1', 'attn': {'qkv', 'proj'}}
    (dense); bias: (H, n, n) materialized rel-pos bias (table grad flows
    through the caller's gather); m1: (B,) f32 per-IMAGE stochastic-depth
    scales (see swin_block_fused_train — per-image granularity makes a
    strip-varying scale inexpressible; fwd and bwd expand to their own strip
    sizes exactly). The VJP recomputes the attention internals from the
    saved x with the full-block VJP's backward kernel."""
    _check_per_image_scales(x, num_windows, m1)
    return _attn_half_train_fwd_call(
        x, p, bias, mask, m1, heads, num_windows, scale, eps
    )


def _attn_half_train_fwd_rule(x, p, bias, mask, m1, heads, num_windows, scale, eps):
    y = _attn_half_train_fwd_call(
        x, p, bias, mask, m1, heads, num_windows, scale, eps
    )
    return y, (x, p, bias, mask, m1)


def _attn_half_train_bwd_rule(heads, num_windows, scale, eps, res, dy):
    x, p, bias, mask, m1 = res
    bw, n, c = x.shape
    wpb = _bwd_wpb(num_windows, n, c, bw)
    # m1 is per image: expanding to the backward's own strip size is exact
    m1_bwd = jnp.repeat(m1, num_windows // wpb)[:, None]
    dx, dwqkv, dbqkv, dwproj, dbproj, dg1, dbe1, dbias = _attn_bwd_dispatch(
        x, dy, p, bias, mask, m1_bwd, heads, num_windows, scale, eps, wpb
    )

    def lin_grad(node, dw, db):
        g = {"w": dw}
        if "b" in node:
            g["b"] = db[0]
        return g

    dp = {
        "norm1": {"scale": dg1[0], "bias": dbe1[0]},
        "attn": {
            "qkv": lin_grad(p["attn"]["qkv"], dwqkv, dbqkv),
            "proj": lin_grad(p["attn"]["proj"], dwproj, dbproj),
        },
    }
    dp = jax.tree.map(lambda g, v: g.astype(v.dtype), dp, p)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dx, dp, dbias.astype(bias.dtype), dmask, jnp.zeros_like(m1)


swin_attn_half_fused_train.defvjp(_attn_half_train_fwd_rule, _attn_half_train_bwd_rule)


def _mlp_half_kernel_train(
    x2_ref, g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, m2_ref,
    out_ref, *, eps,
):
    x2 = x2_ref[:]
    h = _ln(x2, g2_ref, b2_ref, eps)
    h = _linear(h, wfc1_ref, bfc1_ref)
    h = _gelu_exact(h.astype(jnp.float32)).astype(h.dtype)
    m2 = m2_ref[0, pl.program_id(0)]
    mlp = _linear(h, wfc2_ref, bfc2_ref).astype(jnp.float32)
    out_ref[:] = (x2.astype(jnp.float32) + m2 * mlp).astype(x2.dtype)


def _mlp_half_train_fwd_call(x2, p, m2_rows, eps, rpp):
    rows, c = x2.shape
    hidden = p["mlp"]["fc1"]["w"].shape[1]

    def const(shape):
        return pl.BlockSpec(
            shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weights = [
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["mlp"]["fc1"]["w"].astype(x2.dtype), _bias_of(p["mlp"]["fc1"], hidden),
        p["mlp"]["fc2"]["w"].astype(x2.dtype), _bias_of(p["mlp"]["fc2"], c),
    ]
    return pl.pallas_call(
        functools.partial(_mlp_half_kernel_train, eps=eps),
        grid=(rows // rpp,),
        in_specs=[
            pl.BlockSpec((rpp, c), lambda j: (j, 0), memory_space=pltpu.VMEM),
            *[const(w.shape) for w in weights],
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rpp, c), lambda j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x2.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x2, *weights, m2_rows.reshape(1, -1))


def _mlp_half_train(x2, p, m2, eps, rows_per_image):
    hidden = p["mlp"]["fc1"]["w"].shape[1]
    rpp = _mlp_rows_per_program(rows_per_image, hidden)
    m2_rows = jnp.repeat(m2[:, None], rows_per_image // rpp, axis=0).reshape(-1, 1)
    return _mlp_half_train_fwd_call(x2, p, m2_rows, eps, rpp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def swin_mlp_half_fused_train(x2, p, m2, eps, rows_per_image):
    """Differentiable x2 + m2*fc2(gelu(fc1(LN2(x2)))) over flat rows (R, c).
    p: {'norm2', 'mlp'} (dense). m2: (B,) f32 per-IMAGE stochastic-depth
    scales; rows_per_image (static) = rows belonging to one image (row blocks
    never straddle images so the per-image scale is constant over a block).
    The VJP recomputes from the saved x2 with the full-block VJP's backward
    kernel."""
    return _mlp_half_train(x2, p, m2, eps, rows_per_image)


def _mlp_half_train_fwd_rule(x2, p, m2, eps, rows_per_image):
    y = _mlp_half_train(x2, p, m2, eps, rows_per_image)
    return y, (x2, p, m2)


def _mlp_half_train_bwd_rule(eps, rows_per_image, res, dy):
    x2, p, m2 = res
    hidden = p["mlp"]["fc1"]["w"].shape[1]
    rpp = _mlp_rows_per_program(rows_per_image, hidden, budget=2_200_000)
    m2_rows = jnp.repeat(m2[:, None], rows_per_image // rpp, axis=0).reshape(-1, 1)
    dx2, dw1, db1, dw2, db2, dg2, dbe2 = _mlp_bwd_dispatch(
        x2, dy, p, m2_rows, eps, rpp
    )

    def lin_grad(node, dw, db):
        g = {"w": dw}
        if "b" in node:
            g["b"] = db[0]
        return g

    dp = {
        "norm2": {"scale": dg2[0], "bias": dbe2[0]},
        "mlp": {
            "fc1": lin_grad(p["mlp"]["fc1"], dw1, db1),
            "fc2": lin_grad(p["mlp"]["fc2"], dw2, db2),
        },
    }
    dp = jax.tree.map(lambda g, v: g.astype(v.dtype), dp, p)
    return dx2, dp, jnp.zeros_like(m2)


swin_mlp_half_fused_train.defvjp(_mlp_half_train_fwd_rule, _mlp_half_train_bwd_rule)
