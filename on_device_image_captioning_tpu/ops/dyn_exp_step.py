"""Pallas TPU kernel: fused incremental Dynamic-Expansion step.

The beam-search hot loop (SURVEY hot-loop #1) runs decode/cache._dyn_exp_step
per decoder layer per token: ~15 XLA ops over small tensors (cache row writes,
two masked L1 normalizations, four small matmuls, selector mix). This kernel
fuses the whole step into one pass per batch row; the beam reshuffle is fused
into the cache reads via scalar-prefetched source-row index maps, so beam
search never runs a separate gather pass over the caches, and the z scores /
normalized weights never touch HBM.

The per-position query block queries[l, e] = query_exp[e] + cond(x2[l]) is
rank-structured, so only cond (L, d) is cached (16x smaller than storing the
(L, E, d) queries) and the backward score column is computed as two small dots
expanded to the flat (L*E) layout with one-hot matmuls.

The five d x d projections (cond/key/class_a/class_b/selector) stay in XLA where
the MXU handles the batched GEMMs; the kernel consumes their outputs.

Numerics match decode/cache._dyn_exp_step to fp32 reduction-order differences
(same masking, eps, bf16 products, fp32 accumulation; equivalence asserted in
interpreter mode in tests/test_pallas_ops.py). On hardware the different
accumulation order can flip beam choices on near-ties vs the reference-exact
XLA path; the token-parity fuzz in tests/test_decode.py covers this impl too.
With the cond-cache rank decomposition and the fused beam reshuffle this impl
carried e2e from 218 -> 239 img/s at b8 (bench.py, which enables it by
default via decode.cache.set_dyn_step_impl('pallas')).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dyn_core(
    pos_ref, q_ref, bias_ref, k_ref, ca_in_ref, cb_in_ref, cond_in_ref,
    sel_ref, embed_ref, _keys_in, _ca_in, _cb_in, _cond_in, _vals_a_in,
    _vals_b_in, keys_ref, ca_ref, cb_ref, cond_ref, vals_a_ref, vals_b_ref,
    *, eps: float, L: int, E: int, d: int,
):
    """The dynamic-expansion step body shared by every kernel variant: writes
    the six cache refs and returns the selector-mixed output (1, d) fp32."""
    pos = pos_ref[0]
    cd = keys_ref.dtype
    k_row = k_ref[0]  # (1, d) — per-row tensors ride as (1, 1, d) blocks

    # --- cache row writes at pos: dynamic sublane stores are not provable on
    # tiled VMEM, so write full tiles through a one-hot select (tiles are tiny).
    # Inputs come from the SOURCE beam row (src_ref-driven index maps); outputs
    # are fresh buffers for row i — the fused beam reshuffle.
    # masks built at their final ranks: Mosaic cannot insert minor dims on i1
    onehot2 = (
        jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) == pos
    )  # (L, 1)
    onehot3 = (
        jax.lax.broadcasted_iota(jnp.int32, (L, 1, 1), 0) == pos
    )  # (L, 1, 1)
    keys_ref[0] = jnp.where(onehot2, k_row.astype(cd), _keys_in[0])
    ca_ref[0] = jnp.where(onehot2, ca_in_ref[0].astype(cd), _ca_in[0])
    cb_ref[0] = jnp.where(onehot2, cb_in_ref[0].astype(cd), _cb_in[0])
    cond_ref[0] = jnp.where(onehot2, cond_in_ref[0].astype(cd), _cond_in[0])

    valid_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) <= pos  # (1, L)

    # --- forward rows (pos, :): z_fw (E, L) over cached keys ----------------
    # NOTE: dots run on fp32 operands — Mosaic (as of jax 0.9) miscompiles
    # bf16 operands with fp32 accumulation for these shapes
    q = q_ref[0].astype(cd).astype(jnp.float32)  # (E, d); cast via cd first so
    # numerics match the XLA path's bf16-stored caches
    keys = keys_ref[0].astype(jnp.float32)  # (L, d)
    z_fw = jax.lax.dot_general(
        q, keys, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / (d**0.5)  # (E, L)
    a_fw = jnp.where(valid_l, jnp.maximum(z_fw, 0.0), 0.0)
    b_fw = jnp.where(valid_l, jnp.maximum(-z_fw, 0.0), 0.0)
    a_fw = a_fw / (jnp.sum(a_fw, axis=-1, keepdims=True) + eps)
    b_fw = b_fw / (jnp.sum(b_fw, axis=-1, keepdims=True) + eps)
    fw_a = jax.lax.dot_general(
        a_fw.astype(cd).astype(jnp.float32), ca_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (E, d)
    fw_b = jax.lax.dot_general(
        b_fw.astype(cd).astype(jnp.float32), cb_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bias = bias_ref[0].astype(jnp.float32)
    vals_a_ref[0] = jnp.where(
        onehot3, (fw_a + bias).astype(cd)[None], _vals_a_in[0]
    )
    vals_b_ref[0] = jnp.where(
        onehot3, (fw_b + bias).astype(cd)[None], _vals_b_in[0]
    )

    # --- backward row pos: z column over all cached (query_exp + cond) -------
    # z[(l, e)] = (cond[l] + query_exp[e]) . k — two small dots expanded to the
    # flat (1, L*E) layout via constant one-hot matmuls (no rank-changing
    # vector reshapes, no dynamic lane gathers)
    k_i = k_row.astype(cd).astype(jnp.float32)  # (1, d)
    zc = jax.lax.dot_general(
        k_i, cond_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, L)
    ze = jax.lax.dot_general(
        k_i, embed_ref[:].astype(cd).astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, E)
    flat_idx = jax.lax.broadcasted_iota(jnp.int32, (1, L * E), 1)
    # expansion matrices: M_l[l, l*E+e] = 1 ; M_e[e, l*E+e] = 1
    m_l = (
        jax.lax.broadcasted_iota(jnp.int32, (L, L * E), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (L, L * E), 1) // E
    ).astype(jnp.float32)
    m_e = (
        jax.lax.broadcasted_iota(jnp.int32, (E, L * E), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (E, L * E), 1) % E
    ).astype(jnp.float32)
    z_col = (
        jax.lax.dot_general(
            zc, m_l, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            ze, m_e, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ) / (d**0.5)  # (1, L*E)
    valid_flat = flat_idx // E <= pos  # (1, L*E)
    a_bw = jnp.where(valid_flat, jnp.maximum(z_col, 0.0), 0.0)
    b_bw = jnp.where(valid_flat, jnp.maximum(-z_col, 0.0), 0.0)
    a_bw = a_bw / (jnp.sum(a_bw, axis=-1, keepdims=True) + eps)
    b_bw = b_bw / (jnp.sum(b_bw, axis=-1, keepdims=True) + eps)
    out_a = jax.lax.dot_general(
        a_bw.astype(cd).astype(jnp.float32),
        vals_a_ref[0].reshape(L * E, d).astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, d)
    out_b = jax.lax.dot_general(
        b_bw.astype(cd).astype(jnp.float32),
        vals_b_ref[0].reshape(L * E, d).astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sel = sel_ref[0].astype(jnp.float32)  # (1, d)
    return sel * out_a + (1.0 - sel) * out_b  # (1, d) fp32


def _kernel(
    pos_ref, src_ref, q_ref, bias_ref, k_ref, ca_in_ref, cb_in_ref,
    cond_in_ref, sel_ref, embed_ref, _keys_in, _ca_in, _cb_in, _cond_in,
    _vals_a_in, _vals_b_in, keys_ref, ca_ref, cb_ref, cond_ref, vals_a_ref,
    vals_b_ref, out_ref, *, eps: float, L: int, E: int, d: int,
):
    out = _dyn_core(
        pos_ref, q_ref, bias_ref, k_ref, ca_in_ref, cb_in_ref, cond_in_ref,
        sel_ref, embed_ref, _keys_in, _ca_in, _cb_in, _cond_in, _vals_a_in,
        _vals_b_in, keys_ref, ca_ref, cb_ref, cond_ref, vals_a_ref,
        vals_b_ref, eps=eps, L=L, E=E, d=d,
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _kernel_dst(
    pos_ref, src_ref, q_ref, bias_ref, k_ref, ca_in_ref, cb_in_ref,
    cond_in_ref, sel_ref, embed_ref, _keys_in, _ca_in, _cb_in, _cond_in,
    _vals_a_in, _vals_b_in, _d0, _d1, _d2, _d3, _d4, _d5,
    keys_ref, ca_ref, cb_ref, cond_ref, vals_a_ref, vals_b_ref, out_ref,
    *, eps, L, E, d,
):
    """Variant with 6 donated destination buffers (aliased to the cache
    outputs; never read — the out_refs ARE those buffers)."""
    _kernel(
        pos_ref, src_ref, q_ref, bias_ref, k_ref, ca_in_ref, cb_in_ref,
        cond_in_ref, sel_ref, embed_ref, _keys_in, _ca_in, _cb_in, _cond_in,
        _vals_a_in, _vals_b_in, keys_ref, ca_ref, cb_ref, cond_ref,
        vals_a_ref, vals_b_ref, out_ref, eps=eps, L=L, E=E, d=d,
    )


# Mosaic's scoped-VMEM limit for a kernel's pipeline buffers. The step
# kernel's per-program footprint grows linearly in the cache length L, so a
# long-enough decode budget with fp32 caches overflows it: SCST sampling at
# max_seq_len 74 (f32 caches, L=57 chunk, E=16, d=512) was reported as
# "Scoped allocation with size 16.25M and limit 16.00M" — the model below
# reproduces that 16.25M within 0.2%, and the known-working beam configs
# (bf16 caches, dst ping-pong, L<=75) land at ~14M. Callers must check
# step_eligible() and use the XLA incremental step otherwise
# (decode/cache._dyn_exp_step does).
VMEM_SCOPED_LIMIT_BYTES = 16 * 1024 * 1024
_VMEM_SAFETY_BYTES = 256 * 1024


def step_scoped_vmem_bytes(L, E, d, cache_itemsize, dst=False):
    """Estimated scoped-VMEM bytes of one dyn_exp_step_pallas program.

    Cache input and output block sets are double-buffered by the pipeline;
    the dst-mode donated inputs ride constant index maps (fetched once, so
    counted single-buffered — consistent with the beam ping-pong configs
    that compile today); the small per-row blocks are double-buffered but
    negligible."""
    cache_set = 4 * L * d + 2 * L * E * d  # keys/ca/cb/cond + vals_a/vals_b
    small = (3 * E * d + 6 * d) * cache_itemsize + 2 * 4 * d  # q/bias/embed + x-projs; sel+out f32
    total = 2 * (2 * cache_set * cache_itemsize + small)
    if dst:
        total += cache_set * cache_itemsize
    return total


def step_eligible(L, E, d, cache_itemsize, dst=False):
    """True when the step kernel's scoped-VMEM footprint fits the 16 MiB
    limit (with a safety margin); False means use the XLA incremental step."""
    return (
        step_scoped_vmem_bytes(L, E, d, cache_itemsize, dst=dst)
        <= VMEM_SCOPED_LIMIT_BYTES - _VMEM_SAFETY_BYTES
    )


def dyn_exp_step_pallas(
    pos,  # scalar int32
    q_i,  # (B, E, d) query_exp + cond at pos
    bias_i,  # (B, E, d)
    k_i,  # (B, d)
    ca_i,  # (B, d)
    cb_i,  # (B, d)
    cond_i,  # (B, d)
    sel,  # (B, d) sigmoid(selector_embed(x2))
    embed,  # (E, d) query_exp embedding
    keys,  # (B, L, d)
    ca,  # (B, L, d)
    cb,  # (B, L, d)
    cond,  # (B, L, d)
    vals_a,  # (B, L, E, d)
    vals_b,  # (B, L, E, d)
    eps: float = 1e-9,
    reorder=None,  # (B,) int32 beam-source rows, or None for identity
    dst=None,  # optional 6-tuple of donated dead buffers (keys..vals_b)
    in_place=False,  # alias the cache INPUTS to the outputs (reorder None only)
):
    """Returns (out (B, d) fp32, keys, ca, cb, cond, vals_a, vals_b updated).

    reorder fuses the beam reshuffle into the kernel: output row i continues
    cache row reorder[i] — the cache INPUT index maps read through the
    scalar-prefetched source indices, so the separate per-step gather pass
    over every cache disappears. (This forbids aliasing the cache INPUTS to
    the outputs: rows may be read by several programs.)

    dst: a DEAD buffer set (same shapes/dtypes as the caches) donated via
    input_output_aliases so the kernel writes the new caches into it in
    place. Without it, calling this inside a while body makes XLA copy every
    cache around the custom-call (~6.9 ms/decode at b32/beam3: the carry
    pins each tuple position to a fixed allocation, so the un-aliased fresh
    outputs must be copied back into the carry buffers). The caller must
    keep buffer roles FIXED across iterations — a 2-step-unrolled loop body
    that ping-pongs two cache sets A/B per iteration (decode/beam_search.py)
    — because swapping the sets' tuple positions per iteration instead makes
    XLA copy BOTH sets (measured 27.6 -> 47.8 ms).

    in_place: when there is NO reorder (each program reads exactly its own
    row), the cache inputs themselves can be donated — the kernel updates
    the caches in place with no second buffer set and no loop unrolling
    (decode/sampling.py). Row i's input block is DMA'd to VMEM before its
    output block is written back, so the read-before-write order holds
    per program."""
    b, L, E, d = vals_a.shape
    cd = keys.dtype
    if in_place:
        assert reorder is None and dst is None, (
            "in_place needs identity cache reads (no reorder) and no dst"
        )
    if reorder is None:
        reorder = jnp.arange(b, dtype=jnp.int32)

    # index maps receive (grid index, *scalar-prefetch refs) under
    # PrefetchScalarGridSpec; cache INPUTS are indexed by the source row
    row = lambda i, _p, _s: (i, 0, 0)
    src_row = lambda i, _p, s: (s[i], 0, 0)
    src_row4 = lambda i, _p, s: (s[i], 0, 0, 0)
    out_row = lambda i, _p, _s: (i, 0, 0)
    out_row4 = lambda i, _p, _s: (i, 0, 0, 0)
    const2 = lambda i, _p, _s: (0, 0)
    # 2D (B, d) tensors ride reshaped to (B, 1, d) so each (1, 1, d) block's
    # trailing dims equal the array dims (Mosaic's tiling constraint)
    in_specs = [
        pl.BlockSpec((1, E, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, E, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((E, d), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), src_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), src_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), src_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), src_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, E, d), src_row4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, E, d), src_row4, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, L, d), out_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), out_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), out_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), out_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, E, d), out_row4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, E, d), out_row4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), out_row, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(keys.shape, cd),
        jax.ShapeDtypeStruct(ca.shape, cd),
        jax.ShapeDtypeStruct(cb.shape, cd),
        jax.ShapeDtypeStruct(cond.shape, cd),
        jax.ShapeDtypeStruct(vals_a.shape, cd),
        jax.ShapeDtypeStruct(vals_b.shape, cd),
        jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
    ]

    args = [
        jnp.asarray(pos, jnp.int32).reshape(1),
        jnp.asarray(reorder, jnp.int32).reshape(b),
        q_i.astype(cd), bias_i.astype(cd),
        k_i.astype(cd).reshape(b, 1, d), ca_i.astype(cd).reshape(b, 1, d),
        cb_i.astype(cd).reshape(b, 1, d), cond_i.astype(cd).reshape(b, 1, d),
        sel.astype(jnp.float32).reshape(b, 1, d),
        embed.astype(cd),
        keys, ca, cb, cond, vals_a, vals_b,
    ]
    aliases = {}
    if in_place:
        # cache inputs 10..15 donated straight to outputs 0..5
        aliases = {10 + j: j for j in range(6)}
        kernel = functools.partial(_kernel, eps=eps, L=L, E=E, d=d)
    elif dst is not None:
        # donated buffers ride as inputs 16..21, aliased to outputs 0..5
        # (alias indices count the scalar-prefetch operands); the kernel
        # never reads these refs — out_refs ARE their buffers. CONSTANT
        # index maps so the pipeline fetches one (dead) block once and
        # revisits it, instead of streaming the whole dead buffer in
        const3 = lambda i, _p, _s: (0, 0, 0)
        const4 = lambda i, _p, _s: (0, 0, 0, 0)
        in_specs = in_specs + [
            pl.BlockSpec((1, L, d), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, E, d), const4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, E, d), const4, memory_space=pltpu.VMEM),
        ]
        args = args + list(dst)
        aliases = {16 + j: j for j in range(6)}
        kernel = functools.partial(_kernel_dst, eps=eps, L=L, E=E, d=d)
    else:
        kernel = functools.partial(_kernel, eps=eps, L=L, E=E, d=d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=jax.default_backend() != "tpu",
    )(*args)
    new_keys, new_ca, new_cb, new_cond, new_va, new_vb, out = outs
    return out.reshape(b, d), new_keys, new_ca, new_cb, new_cond, new_va, new_vb


# ---------------------------------------------------------------------------
# Fused dyn-step + cross-attention (VERDICT r3 item 7): one kernel per layer
# per token runs the dynamic-expansion step AND the residual-add -> LayerNorm
# -> single-query cross-attention (Wq/out_linear GEMMs included) tail, so the
# while-loop body dispatches ONE custom call per decoder layer instead of a
# Pallas call plus the ~10 XLA ops of decode/cache._cross_attention_step.
# The FF half (2 x d*ff GEMMs = 4 MB/layer bf16) deliberately stays in XLA:
# it batches all rows in one MXU dispatch and its weights would dominate the
# kernel's VMEM budget beside the L-slot value caches.
# ---------------------------------------------------------------------------


def _cross_tail(
    out_dyn, y_ref, g2_ref, b2_ref, wq_ref, bq_ref, wo_ref, bo_ref,
    kc_ref, vc_ref, mask_ref, cd, *, heads, ln_eps, attn_fill, d, rd,
):
    """y + out_dyn -> LN2 -> single-query cross-attention -> y residual.

    Replicates decode/cache._cross_attention_step's exact dtype discipline:
    `rd` is the compute dtype the XLA path passes to linear() (its rounding
    point), `cd` the cache storage dtype (the .astype(k.dtype)/.astype(
    v.dtype) casts); fp32 stats/softmax/accumulation throughout; dots run on
    fp32-cast operands — exact for bf16 values — because Mosaic miscompiles
    bf16-operand dots at these shapes (see _dyn_core's note). Returns the
    (1, d) fp32 residual stream after the cross-attention add."""
    y = y_ref[0].astype(jnp.float32) + out_dyn  # (1, d)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    x2 = (y - mean) * jax.lax.rsqrt(var + ln_eps) * g2_ref[:].astype(
        jnp.float32
    ) + b2_ref[:].astype(jnp.float32)

    q = jax.lax.dot_general(
        x2.astype(rd).astype(jnp.float32), wq_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # linear() rounds its output to rd; the XLA path then casts q to the
    # cache dtype before the score einsum (.astype(k.dtype))
    q = (
        (q + bq_ref[:].astype(jnp.float32))
        .astype(rd).astype(cd).astype(jnp.float32)
    )

    dk = d // heads
    s = kc_ref.shape[1]
    kc = kc_ref[0].astype(jnp.float32)  # (S, d)
    vc = vc_ref[0].astype(jnp.float32)
    # scores[s, h] = sum_k kc[s, h*dk+k] * q[h*dk+k] / sqrt(dk): elementwise
    # product, then a constant one-hot head-sum matrix on the MXU (exact —
    # the zero terms add exactly; only fp32 summation order differs from the
    # XLA einsum)
    m_h = (
        jax.lax.broadcasted_iota(jnp.int32, (d, heads), 0) // dk
        == jax.lax.broadcasted_iota(jnp.int32, (d, heads), 1)
    ).astype(jnp.float32)
    scores = jax.lax.dot_general(
        kc * q, m_h, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / (dk**0.5)  # (S, heads)
    scores = jnp.where(mask_ref[0] > 0, scores, attn_fill)
    mx = jnp.max(scores, axis=0, keepdims=True)
    ex = jnp.exp(scores - mx)
    attn = ex / jnp.sum(ex, axis=0, keepdims=True)
    attn = attn.astype(cd).astype(jnp.float32)  # XLA casts attn to v.dtype
    attn_exp = jax.lax.dot_general(
        attn, m_h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, d): column c carries attn[:, c // dk]
    o = jax.lax.dot_general(
        jnp.ones((1, s), jnp.float32), vc * attn_exp,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, d)
    o = o.astype(rd).astype(jnp.float32)  # linear() casts its input to rd
    mo = jax.lax.dot_general(
        o, wo_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mo = (mo + bo_ref[:].astype(jnp.float32)).astype(rd).astype(jnp.float32)
    return y + mo


def _kernel_cross(
    pos_ref, src_ref, q_ref, bias_ref, k_ref, ca_in_ref, cb_in_ref,
    cond_in_ref, sel_ref, embed_ref, y_ref, g2_ref, b2_ref, wq_ref, bq_ref,
    wo_ref, bo_ref, kc_ref, vc_ref, mask_ref, _keys_in, _ca_in, _cb_in,
    _cond_in, _vals_a_in, _vals_b_in, keys_ref, ca_ref, cb_ref, cond_ref,
    vals_a_ref, vals_b_ref, yout_ref,
    *, eps, L, E, d, heads, ln_eps, attn_fill, rd,
):
    out = _dyn_core(
        pos_ref, q_ref, bias_ref, k_ref, ca_in_ref, cb_in_ref, cond_in_ref,
        sel_ref, embed_ref, _keys_in, _ca_in, _cb_in, _cond_in, _vals_a_in,
        _vals_b_in, keys_ref, ca_ref, cb_ref, cond_ref, vals_a_ref,
        vals_b_ref, eps=eps, L=L, E=E, d=d,
    )
    yout_ref[0] = _cross_tail(
        out, y_ref, g2_ref, b2_ref, wq_ref, bq_ref, wo_ref, bo_ref, kc_ref,
        vc_ref, mask_ref, keys_ref.dtype, heads=heads, ln_eps=ln_eps,
        attn_fill=attn_fill, d=d, rd=rd,
    ).astype(yout_ref.dtype)


def _kernel_cross_dst(
    pos_ref, src_ref, q_ref, bias_ref, k_ref, ca_in_ref, cb_in_ref,
    cond_in_ref, sel_ref, embed_ref, y_ref, g2_ref, b2_ref, wq_ref, bq_ref,
    wo_ref, bo_ref, kc_ref, vc_ref, mask_ref, _keys_in, _ca_in, _cb_in,
    _cond_in, _vals_a_in, _vals_b_in, _d0, _d1, _d2, _d3, _d4, _d5,
    keys_ref, ca_ref, cb_ref, cond_ref, vals_a_ref, vals_b_ref, yout_ref,
    *, eps, L, E, d, heads, ln_eps, attn_fill, rd,
):
    _kernel_cross(
        pos_ref, src_ref, q_ref, bias_ref, k_ref, ca_in_ref, cb_in_ref,
        cond_in_ref, sel_ref, embed_ref, y_ref, g2_ref, b2_ref, wq_ref,
        bq_ref, wo_ref, bo_ref, kc_ref, vc_ref, mask_ref, _keys_in, _ca_in,
        _cb_in, _cond_in, _vals_a_in, _vals_b_in, keys_ref, ca_ref, cb_ref,
        cond_ref, vals_a_ref, vals_b_ref, yout_ref, eps=eps, L=L, E=E, d=d,
        heads=heads, ln_eps=ln_eps, attn_fill=attn_fill, rd=rd,
    )


def dyn_exp_cross_step_pallas(
    pos, q_i, bias_i, k_i, ca_i, cb_i, cond_i, sel, embed,
    y,  # (B, d) residual stream BEFORE the dyn-expansion add (fp32)
    ln2,  # {'scale', 'bias'} LayerNorm params
    wq, bq, wo, bo,  # cross-attention Wq / out_linear (dense)
    k_cross, v_cross,  # (B_img, S, d) cached encoder projections
    enc_mask_f,  # (B_img, S) f32 1/0 mask (ones when no encoder pads)
    keys, ca, cb, cond, vals_a, vals_b,
    *, heads: int, ln_eps: float, attn_fill: float, group: int = 1,
    eps: float = 1e-9, reorder=None, dst=None, in_place=False,
    compute_dtype=None,
):
    """Fused dyn-step + LN2 + single-query cross-attention (+ both residual
    adds). Same cache/reorder/donation semantics as dyn_exp_step_pallas;
    returns (y_out (B, d) fp32, keys, ca, cb, cond, vals_a, vals_b).

    k_cross/v_cross/enc_mask_f have one row per IMAGE; row i of the batch
    reads image row i // group (beams/samples of one image share them), which
    also keeps them out of the while carry."""
    b, L, E, d = vals_a.shape
    cd = keys.dtype
    rd = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32
    s = k_cross.shape[1]
    if in_place:
        assert reorder is None and dst is None, (
            "in_place needs identity cache reads (no reorder) and no dst"
        )
    if reorder is None:
        reorder = jnp.arange(b, dtype=jnp.int32)

    row = lambda i, _p, _s: (i, 0, 0)
    src_row = lambda i, _p, s_: (s_[i], 0, 0)
    src_row4 = lambda i, _p, s_: (s_[i], 0, 0, 0)
    out_row = lambda i, _p, _s: (i, 0, 0)
    out_row4 = lambda i, _p, _s: (i, 0, 0, 0)
    const2 = lambda i, _p, _s: (0, 0)
    img_row = lambda i, _p, _s: (i // group, 0, 0)

    in_specs = [
        pl.BlockSpec((1, E, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, E, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((E, d), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), row, memory_space=pltpu.VMEM),  # y
        pl.BlockSpec((1, d), const2, memory_space=pltpu.VMEM),  # g2
        pl.BlockSpec((1, d), const2, memory_space=pltpu.VMEM),  # b2
        pl.BlockSpec((d, d), const2, memory_space=pltpu.VMEM),  # wq
        pl.BlockSpec((1, d), const2, memory_space=pltpu.VMEM),  # bq
        pl.BlockSpec((d, d), const2, memory_space=pltpu.VMEM),  # wo
        pl.BlockSpec((1, d), const2, memory_space=pltpu.VMEM),  # bo
        pl.BlockSpec((1, s, d), img_row, memory_space=pltpu.VMEM),  # kc
        pl.BlockSpec((1, s, d), img_row, memory_space=pltpu.VMEM),  # vc
        pl.BlockSpec((1, s, 1), img_row, memory_space=pltpu.VMEM),  # mask
        pl.BlockSpec((1, L, d), src_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), src_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), src_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), src_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, E, d), src_row4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, E, d), src_row4, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, L, d), out_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), out_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), out_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, d), out_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, E, d), out_row4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, E, d), out_row4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), out_row, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(keys.shape, cd),
        jax.ShapeDtypeStruct(ca.shape, cd),
        jax.ShapeDtypeStruct(cb.shape, cd),
        jax.ShapeDtypeStruct(cond.shape, cd),
        jax.ShapeDtypeStruct(vals_a.shape, cd),
        jax.ShapeDtypeStruct(vals_b.shape, cd),
        jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
    ]
    args = [
        jnp.asarray(pos, jnp.int32).reshape(1),
        jnp.asarray(reorder, jnp.int32).reshape(b),
        q_i.astype(cd), bias_i.astype(cd),
        k_i.astype(cd).reshape(b, 1, d), ca_i.astype(cd).reshape(b, 1, d),
        cb_i.astype(cd).reshape(b, 1, d), cond_i.astype(cd).reshape(b, 1, d),
        sel.astype(jnp.float32).reshape(b, 1, d),
        embed.astype(cd),
        y.astype(jnp.float32).reshape(b, 1, d),
        ln2["scale"].astype(jnp.float32).reshape(1, d),
        ln2["bias"].astype(jnp.float32).reshape(1, d),
        wq.astype(rd), bq.astype(jnp.float32).reshape(1, d),
        wo.astype(rd), bo.astype(jnp.float32).reshape(1, d),
        k_cross, v_cross,
        enc_mask_f.astype(jnp.float32)[..., None],
        keys, ca, cb, cond, vals_a, vals_b,
    ]
    kw = dict(eps=eps, L=L, E=E, d=d, heads=heads, ln_eps=ln_eps,
              attn_fill=attn_fill, rd=rd)
    aliases = {}
    if in_place:
        # cache inputs at tensor slots 18..23 (+2 scalar-prefetch operands)
        aliases = {20 + j: j for j in range(6)}
        kernel = functools.partial(_kernel_cross, **kw)
    elif dst is not None:
        const3 = lambda i, _p, _s: (0, 0, 0)
        const4 = lambda i, _p, _s: (0, 0, 0, 0)
        in_specs = in_specs + [
            pl.BlockSpec((1, L, d), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, E, d), const4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, E, d), const4, memory_space=pltpu.VMEM),
        ]
        args = args + list(dst)
        aliases = {26 + j: j for j in range(6)}
        kernel = functools.partial(_kernel_cross_dst, **kw)
    else:
        kernel = functools.partial(_kernel_cross, **kw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=jax.default_backend() != "tpu",
    )(*args)
    new_keys, new_ca, new_cb, new_cond, new_va, new_vb, y_out = outs
    return (
        y_out.reshape(b, d), new_keys, new_ca, new_cb, new_cond, new_va,
        new_vb,
    )
