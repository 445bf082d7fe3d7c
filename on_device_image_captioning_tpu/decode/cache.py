"""Incremental decoder state for autoregressive decoding.

The reference decodes by re-running the FULL decoder stack over the whole prefix at
every step — O(T^2) work per step, O(T^3) per caption, with the (T, vocab) output
projection recomputed each time (reference models/captioning_model.py:290-399).

This module decodes one token per step with exact numerics. The Dynamic Expansion
block admits an exact incremental form because all of its normalizations are
row-local (reference models/layers.py:176-195):

- forward rows (i, e) normalize z[(i,e), j<=i] over keys j <= i — computable at
  step i from cached per-position key projections;
- backward row i normalizes z^T[i, (j,e)] over all expansions of positions j <= i —
  z^T[i, (j,e)] = query[(j,e)] . key[i] = (query_exp[e] + cond[j]) . key[i],
  computable at step i from the cached per-position cond vectors as two small
  dots (exact up to fp32 addition order: the full forward sums the rank-1
  terms before the dot, here after);
- the values the backward row consumes, vals[(j,e)] = class_fw[(j,e)] + bias[(j,e)],
  were finalized at step j (their forward normalization only covers keys <= j) and
  never change.

Cross-attention K/V over the 144 encoder tokens are projected once per layer.
Everything else in the decoder (cond/selector/FF/LayerNorm/reduce) is position-wise.

All buffers are statically shaped (B, max_len, ...) so the step function jits once
and runs inside lax.while_loop / lax.scan.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import CaptionerConfig
from ..models.common import layernorm, linear


class LayerCache(NamedTuple):
    """Per-decoder-layer incremental caches (leading dim B, position dim max_len).

    The reference's per-position query block is queries[l, e] = query_exp[e] +
    cond(x2[l]) — rank-structured in (l, e) — so only cond (B, L, d) is cached
    and the backward scores decompose into two small dots (see _dyn_exp_step).
    This makes the cache 16x (=E) smaller than storing queries outright, which
    matters because the beam reshuffle regathers every cache each step."""

    keys: jnp.ndarray  # (B, L, d)    key_linear(x2) per position
    ca: jnp.ndarray  # (B, L, d)    class_a_embed(x2) per position
    cb: jnp.ndarray  # (B, L, d)    class_b_embed(x2) per position
    cond: jnp.ndarray  # (B, L, d)    cond_embed(x2) per position
    vals_a: jnp.ndarray  # (B, L, E, d) forward result + bias (backward operand)
    vals_b: jnp.ndarray  # (B, L, E, d)
    k_cross: jnp.ndarray  # (B, S, d)    Wk(enc_out), projected once
    v_cross: jnp.ndarray  # (B, S, d)    Wv(enc_out), projected once


class DecState(NamedTuple):
    layers: List[LayerCache]
    # (B, S) bool, True where the encoder token is real — cross-attention mask
    # for padded feature rows (reference models/captioning_model.py:239-281
    # threads enc masks through beam search). None = no encoder pads (Swin
    # stores always emit 144 real tokens).
    enc_mask: Optional[jnp.ndarray] = None


class MutCaches(NamedTuple):
    """The per-step-mutable subset of a LayerCache (everything but the
    loop-invariant cross-attention K/V). Decode loops carry ONLY this part;
    the invariants (k_cross/v_cross/enc_mask) stay out of the while carry and
    are shared across each image's beam/sample group via dec_step's `group`
    argument — one K/V row per image instead of one per beam (3x less decode
    HBM traffic on them), and a real M=group dimension in the cross-attention
    score matmul instead of the batched matvec XLA lowers via per-step
    f32 relayouts of the full K/V (measured ~2.8 ms/decode at b32/beam3)."""

    keys: jnp.ndarray
    ca: jnp.ndarray
    cb: jnp.ndarray
    cond: jnp.ndarray
    vals_a: jnp.ndarray
    vals_b: jnp.ndarray


class StaticState(NamedTuple):
    """Loop-invariant decode inputs: per-layer cross-attention (K, V) pairs
    and the optional encoder pad mask."""

    cross: tuple  # tuple of (k_cross, v_cross) per layer
    enc_mask: Optional[jnp.ndarray] = None


def split_state(state: DecState):
    """DecState -> (list of MutCaches, StaticState)."""
    muts = [
        MutCaches(lc.keys, lc.ca, lc.cb, lc.cond, lc.vals_a, lc.vals_b)
        for lc in state.layers
    ]
    static = StaticState(
        cross=tuple((lc.k_cross, lc.v_cross) for lc in state.layers),
        enc_mask=state.enc_mask,
    )
    return muts, static


def merge_state(muts, static: StaticState) -> DecState:
    """Inverse of split_state."""
    layers = [
        LayerCache(m.keys, m.ca, m.cb, m.cond, m.vals_a, m.vals_b, kc, vc)
        for m, (kc, vc) in zip(muts, static.cross)
    ]
    return DecState(layers=layers, enc_mask=static.enc_mask)


# Dynamic-expansion step implementation: 'xla' (default) or 'pallas'
# (ops/dyn_exp_step.py — one fused kernel per layer per token with in-place
# cache updates). Process-wide toggle, mirroring models.common.set_layernorm_impl.
_DYN_STEP_IMPL = "xla"


def set_dyn_step_impl(impl: str) -> None:
    """One knob for the Pallas decode path: the fused dyn-expansion step AND
    the vocab-wide candidate top-k (ops/topk.py) follow it together.

    'pallas' = the production kernel (dyn-step Pallas kernel + XLA
    cross-attention). 'pallas_fused' additionally folds LN2 + the
    single-query cross-attention into the same call (ops/dyn_exp_step.
    dyn_exp_cross_step_pallas) — built for VERDICT r3 item 7 and MEASURED
    SLOWER at every operating point (b32/beam3/L20 14.58 -> 17.09 ms,
    b8 5.56 -> 5.92, b1/beam5/L74 6.80 -> 7.79; tokens identical): the
    in-kernel per-row Wq/out_linear matvecs and serial softmax cost more
    than the XLA dispatches they remove, because XLA batches those GEMMs
    across all rows in one MXU call. Kept as the recorded negative and for
    shape regimes where dispatch latency could dominate; not CLI-exposed."""
    global _DYN_STEP_IMPL
    assert impl in ("xla", "pallas", "pallas_fused"), impl
    _DYN_STEP_IMPL = impl
    from ..ops.topk import set_topk_impl

    set_topk_impl("xla" if impl == "xla" else "pallas")


def init_state(
    params, cfg: CaptionerConfig, enc_output: jnp.ndarray, max_len: int,
    cache_dtype=jnp.float32, enc_num_pads: Optional[jnp.ndarray] = None,
) -> DecState:
    """Allocate zeroed caches and precompute cross-attention K/V per layer.

    cache_dtype: storage dtype of the per-position caches. They dominate decode
    HBM traffic (each step reads the full (B, L, E, d) query/value caches and the
    beam reshuffle rewrites them), so bf16 storage halves decode bandwidth;
    normalizations and accumulations stay fp32 either way.

    enc_num_pads: (B,) count of trailing pad rows in enc_output (heterogeneous
    feature-store batches — reference data/coco_dataloader.py:437-478); builds
    the cross-attention mask carried by the state.
    """
    b = enc_output.shape[0]
    enc_mask = None
    if enc_num_pads is not None:
        s = enc_output.shape[1]
        enc_mask = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1) < (
            s - enc_num_pads.astype(jnp.int32)
        ).reshape(b, 1)
    d, e = cfg.d_model, cfg.num_exp_dec
    layers = []
    for i in range(cfg.N_dec):
        mha = params["decoders"][i]["mha"]
        layers.append(
            LayerCache(
                keys=jnp.zeros((b, max_len, d), cache_dtype),
                ca=jnp.zeros((b, max_len, d), cache_dtype),
                cb=jnp.zeros((b, max_len, d), cache_dtype),
                cond=jnp.zeros((b, max_len, d), cache_dtype),
                vals_a=jnp.zeros((b, max_len, e, d), cache_dtype),
                vals_b=jnp.zeros((b, max_len, e, d), cache_dtype),
                k_cross=linear(mha["Wk"], enc_output).astype(cache_dtype),
                v_cross=linear(mha["Wv"], enc_output).astype(cache_dtype),
            )
        )
    return DecState(layers=layers, enc_mask=enc_mask)


def _dyn_exp_step(
    p: Dict[str, Any],
    cfg: CaptionerConfig,
    cache: LayerCache,
    x2: jnp.ndarray,
    pos: jnp.ndarray,
    dtype=None,
    reorder: Optional[jnp.ndarray] = None,
    dst: Optional[MutCaches] = None,
    in_place: bool = False,
):
    """One-position Dynamic Expansion (exact; see module docstring).

    x2: (B, d) normalized input at position `pos`. Returns ((B, d), updated cache).
    reorder: (B,) beam-source rows, fused into the Pallas kernel's cache reads
    (the XLA path receives pre-gathered caches from dec_step instead).
    dst: dead donated buffers the Pallas kernel writes the new caches into
    (see dyn_exp_step_pallas and the beam_loop ping-pong).
    """
    b, d = x2.shape
    e = cfg.num_exp_dec
    L = cache.keys.shape[1]

    use_pallas = _DYN_STEP_IMPL != "xla"
    if use_pallas:
        from ..ops.dyn_exp_step import step_eligible

        # long budgets with wide cache dtypes overflow the kernel's scoped
        # VMEM (fp32 caches at L>=57: SCST sampling at max_seq_len 74) —
        # fall back to the XLA incremental step for this cache shape
        use_pallas = step_eligible(
            L, e, d, jnp.dtype(cache.keys.dtype).itemsize, dst=dst is not None
        )
        if not use_pallas and reorder is not None:
            # the Pallas kernel fuses the beam reshuffle into its cache
            # reads; the XLA path expects pre-gathered caches (dec_step only
            # pre-gathers when the IMPL is 'xla', not on a per-shape
            # fallback) — gather here, exact per-row copy
            take = lambda a: jnp.take(a, reorder, axis=0)
            cache = cache._replace(
                keys=take(cache.keys), ca=take(cache.ca), cb=take(cache.cb),
                cond=take(cache.cond), vals_a=take(cache.vals_a),
                vals_b=take(cache.vals_b),
            )
            reorder = None

    _PROJ = ("cond_embed", "key_linear", "class_a_embed", "class_b_embed",
             "selector_embed")
    packed = use_pallas and all(
        "w" in p[k] for k in _PROJ
    )
    if packed:
        # one (B, d) x (d, 5d) GEMM instead of five d x d dispatches per
        # layer per step (identical per-column contraction — tokens match
        # the separate form; the XLA impl keeps the reference-exact op
        # order). The concats are loop-invariant; XLA's while-LICM hoists
        # them out of the decode body.
        w5 = jnp.concatenate([p[k]["w"] for k in _PROJ], axis=1)
        b5 = jnp.concatenate([p[k]["b"] for k in _PROJ])
        y5 = linear({"w": w5, "b": b5}, x2, dtype)
        cond, k_i, ca_i, cb_i, sel_lin = jnp.split(y5, 5, axis=-1)
    else:
        cond = linear(p["cond_embed"], x2, dtype)  # (B, d)
        k_i = linear(p["key_linear"], x2, dtype)
        ca_i = linear(p["class_a_embed"], x2, dtype)
        cb_i = linear(p["class_b_embed"], x2, dtype)
    q_i = p["query_exp"]["embed"][None] + cond[:, None]  # (B, E, d)
    bias_i = p["bias_exp"]["embed"][None] + cond[:, None]

    if use_pallas:
        from ..ops.dyn_exp_step import dyn_exp_step_pallas

        sel = jax.nn.sigmoid(
            (
                sel_lin if packed
                else linear(p["selector_embed"], x2, dtype)
            ).astype(jnp.float32)
        )
        out, keys, ca, cb, cond_c, vals_a, vals_b = dyn_exp_step_pallas(
            pos, q_i, bias_i, k_i, ca_i, cb_i, cond, sel,
            p["query_exp"]["embed"],
            cache.keys, cache.ca, cache.cb, cache.cond, cache.vals_a,
            cache.vals_b, eps=cfg.eps, reorder=reorder,
            dst=None if dst is None else tuple(dst), in_place=in_place,
        )
        return out, cache._replace(
            keys=keys, ca=ca, cb=cb, cond=cond_c, vals_a=vals_a,
            vals_b=vals_b,
        )

    cd = cache.keys.dtype
    keys = cache.keys.at[:, pos].set(k_i.astype(cd))
    ca = cache.ca.at[:, pos].set(ca_i.astype(cd))
    cb = cache.cb.at[:, pos].set(cb_i.astype(cd))
    cond_c = cache.cond.at[:, pos].set(cond.astype(cd))

    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) <= pos
    )  # (1, L) columns j <= pos

    # forward rows (pos, :): z_fw (B, E, L) over cached keys
    z_fw = jnp.einsum(
        "bed,bld->bel", q_i.astype(keys.dtype), keys,
        preferred_element_type=jnp.float32,
    ) / (d**0.5)
    a_fw = jnp.where(valid[:, None, :], jax.nn.relu(z_fw), 0.0)
    b_fw = jnp.where(valid[:, None, :], jax.nn.relu(-z_fw), 0.0)
    a_fw = a_fw / (jnp.sum(a_fw, axis=-1, keepdims=True) + cfg.eps)
    b_fw = b_fw / (jnp.sum(b_fw, axis=-1, keepdims=True) + cfg.eps)
    fw_a = jnp.einsum("bel,bld->bed", a_fw, ca, preferred_element_type=jnp.float32)
    fw_b = jnp.einsum("bel,bld->bed", b_fw, cb, preferred_element_type=jnp.float32)
    vals_a = cache.vals_a.at[:, pos].set((fw_a + bias_i).astype(cd))
    vals_b = cache.vals_b.at[:, pos].set((fw_b + bias_i).astype(cd))

    # backward row pos: z column (B, L, E) = queries . k_i where
    # queries[l, e] = query_exp[e] + cond[l] — rank-structured, so the column
    # decomposes into two small dots instead of reading an (L, E, d) cache
    kq = k_i.astype(cd)
    ze = jnp.einsum(
        "ed,bd->be", p["query_exp"]["embed"].astype(cd), kq,
        preferred_element_type=jnp.float32,
    )  # (B, E)
    zc = jnp.einsum(
        "bld,bd->bl", cond_c, kq, preferred_element_type=jnp.float32
    )  # (B, L)
    z_col = (zc[:, :, None] + ze[:, None, :]) / (d**0.5)  # (B, L, E)
    a_bw = jnp.where(valid[:, :, None], jax.nn.relu(z_col), 0.0).reshape(b, L * e)
    b_bw = jnp.where(valid[:, :, None], jax.nn.relu(-z_col), 0.0).reshape(b, L * e)
    a_bw = a_bw / (jnp.sum(a_bw, axis=-1, keepdims=True) + cfg.eps)
    b_bw = b_bw / (jnp.sum(b_bw, axis=-1, keepdims=True) + cfg.eps)
    out_a = jnp.einsum(
        "bq,bqd->bd", a_bw, vals_a.reshape(b, L * e, d), preferred_element_type=jnp.float32
    )
    out_b = jnp.einsum(
        "bq,bqd->bd", b_bw, vals_b.reshape(b, L * e, d), preferred_element_type=jnp.float32
    )

    selector = jax.nn.sigmoid(linear(p["selector_embed"], x2, dtype).astype(jnp.float32))
    out = selector * out_a + (1.0 - selector) * out_b
    new_cache = cache._replace(
        keys=keys, ca=ca, cb=cb, cond=cond_c, vals_a=vals_a, vals_b=vals_b
    )
    return out, new_cache


def _fused_step_eligible(cfg, cache: LayerCache) -> bool:
    """Scoped-VMEM gate for the opt-in fused dyn+cross kernel: the plain
    step's footprint plus the cross tail's extras (row-indexed K/V cross
    caches double-buffered; the (d, d) Wq/out_linear weights const-indexed,
    single-buffered)."""
    from ..ops.dyn_exp_step import (
        VMEM_SCOPED_LIMIT_BYTES, _VMEM_SAFETY_BYTES, step_scoped_vmem_bytes,
    )

    L = cache.keys.shape[1]
    d = cache.keys.shape[-1]
    isz = jnp.dtype(cache.keys.dtype).itemsize
    extra = 2 * 2 * cache.k_cross.shape[1] * d * jnp.dtype(
        cache.k_cross.dtype
    ).itemsize  # kc/vc row blocks, double-buffered
    extra += 2 * d * d * 4  # Wq/out_linear, const index maps (upper-bounds bf16)
    total = step_scoped_vmem_bytes(L, cfg.num_exp_dec, d, isz) + extra
    return total <= VMEM_SCOPED_LIMIT_BYTES - _VMEM_SAFETY_BYTES


def _dyn_cross_fused_step(
    lp: Dict[str, Any],
    cfg: CaptionerConfig,
    cache: LayerCache,
    y: jnp.ndarray,
    pos: jnp.ndarray,
    dtype=None,
    reorder: Optional[jnp.ndarray] = None,
    dst: Optional[MutCaches] = None,
    in_place: bool = False,
    enc_mask: Optional[jnp.ndarray] = None,
    group: int = 1,
):
    """One decoder layer's dyn-expansion + LN2 + cross-attention as a SINGLE
    Pallas call (the 'pallas' impl): LN1 and the five d x d projections stay
    in XLA (one batched MXU GEMM each across all rows), the kernel runs the
    dyn step, both residual adds, LN2 and the single-query cross-attention
    with its Wq/out_linear GEMMs in VMEM — halving the while-body's per-layer
    dispatch count vs the round-3 dyn-kernel + XLA-cross form (VERDICT r3
    item 7). Returns (y after the cross-attention residual, updated cache).
    """
    from ..ops.dyn_exp_step import dyn_exp_cross_step_pallas

    p = lp["dyn_exp"]
    x2 = layernorm(lp["norm_1"], y, cfg.ln_eps)
    cond = linear(p["cond_embed"], x2, dtype)
    k_i = linear(p["key_linear"], x2, dtype)
    ca_i = linear(p["class_a_embed"], x2, dtype)
    cb_i = linear(p["class_b_embed"], x2, dtype)
    q_i = p["query_exp"]["embed"][None] + cond[:, None]
    bias_i = p["bias_exp"]["embed"][None] + cond[:, None]
    sel = jax.nn.sigmoid(
        linear(p["selector_embed"], x2, dtype).astype(jnp.float32)
    )
    b = y.shape[0]
    s = cache.k_cross.shape[1]
    mask_f = (
        enc_mask.astype(jnp.float32)
        if enc_mask is not None
        else jnp.ones((b // group, s), jnp.float32)
    )
    mha = lp["mha"]
    y_out, keys, ca, cb, cond_c, vals_a, vals_b = dyn_exp_cross_step_pallas(
        pos, q_i, bias_i, k_i, ca_i, cb_i, cond, sel,
        p["query_exp"]["embed"], y, lp["norm_2"],
        mha["Wq"]["w"], mha["Wq"]["b"],
        mha["out_linear"]["w"], mha["out_linear"]["b"],
        cache.k_cross, cache.v_cross, mask_f,
        cache.keys, cache.ca, cache.cb, cache.cond, cache.vals_a,
        cache.vals_b,
        heads=cfg.num_heads, ln_eps=cfg.ln_eps, attn_fill=cfg.attn_fill,
        group=group, eps=cfg.eps, reorder=reorder,
        dst=None if dst is None else tuple(dst), in_place=in_place,
        compute_dtype=dtype,
    )
    return y_out, cache._replace(
        keys=keys, ca=ca, cb=cb, cond=cond_c, vals_a=vals_a, vals_b=vals_b
    )


def _cross_attention_step(
    p,
    cfg: CaptionerConfig,
    cache: LayerCache,
    x2: jnp.ndarray,
    enc_mask: Optional[jnp.ndarray] = None,
    dtype=None,
    group: int = 1,
) -> jnp.ndarray:
    """Single-query cross-attention against the cached encoder K/V
    (reference models/layers.py:266-295). enc_mask masks padded feature
    rows with the same -1e4 fill as the full forward's MHA, so incremental and
    teacher-forced decoding agree on padded stores.

    group: consecutive x2 rows that share one K/V row (the beams/samples of
    one image). x2 has (B_kv * group) rows while the cached K/V and enc_mask
    have B_kv rows; group becomes the M dimension of the score matmul. With
    group=1 this is exactly the ungrouped form."""
    rows, d = x2.shape
    h, dk = cfg.num_heads, cfg.head_dim
    b = rows // group
    s = cache.k_cross.shape[1]
    k = cache.k_cross.reshape(b, s, h, dk)
    v = cache.v_cross.reshape(b, s, h, dk)
    q = linear(p["Wq"], x2, dtype).reshape(b, group, h, dk).astype(k.dtype)
    scores = jnp.einsum(
        "bghd,bshd->bghs", q, k, preferred_element_type=jnp.float32
    ) / (dk**0.5)
    if enc_mask is not None:
        scores = jnp.where(enc_mask[:, None, None, :], scores, cfg.attn_fill)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bghs,bshd->bghd", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).reshape(rows, d)
    return linear(p["out_linear"], out, dtype)


def dec_step(
    params,
    cfg: CaptionerConfig,
    state: DecState,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    dtype=None,
    reorder: Optional[jnp.ndarray] = None,
    group: int = 1,
    prev: Optional[List[MutCaches]] = None,
    in_place: bool = False,
):
    """Decode one position for the whole batch.

    tokens: (B,) int32 input tokens at position `pos` (scalar int32).
    Returns (log_probs (B, vocab), new state). Matches
    forward_dec(..., apply_log_softmax=True)[:, pos] exactly.

    reorder: optional (B,) int32 — output row i continues input row
    reorder[i]'s history (the beam reshuffle). Fusing it here lets the Pallas
    step gather cache rows through its index maps instead of a separate
    full-cache gather pass per step; the XLA path applies the identical
    jnp.take. k_cross/v_cross/enc_mask are beam-invariant within an image's
    group and skip the reorder entirely.

    group: beams/samples per image. The mutable caches and tokens have
    (B_img * group) rows; k_cross/v_cross/enc_mask have B_img rows shared
    across each group (see _cross_attention_step).

    prev: per-layer dead MutCaches buffers donated to the Pallas impl's
    in-place cache writes (ignored by the XLA path); the caller must keep
    buffer roles fixed across loop iterations (see beam_loop's ping-pong).

    in_place: donate the cache inputs themselves (valid only without
    reorder — sampling-style loops; ignored by the XLA path).
    """
    if reorder is not None and _DYN_STEP_IMPL == "xla":
        take = lambda a: jnp.take(a, reorder, axis=0)
        state = DecState(
            layers=[
                lc._replace(
                    keys=take(lc.keys), ca=take(lc.ca), cb=take(lc.cb),
                    cond=take(lc.cond), vals_a=take(lc.vals_a),
                    vals_b=take(lc.vals_b),
                )
                for lc in state.layers
            ],
            enc_mask=state.enc_mask,
        )
        reorder = None
    # mode="clip" matches models/captioner.py forward_dec: stray OOB token
    # ids clamp instead of NaN-filling, so both scoring paths agree
    y = jnp.take(
        params["out_embedder"]["embed"], tokens, axis=0, mode="clip"
    ) * math.sqrt(float(cfg.d_model))
    y = y + jnp.take(params["pos_encoder"]["embed"], pos, axis=0)[None]

    new_layers = []
    y_list = []
    for i in range(cfg.N_dec):
        lp = params["decoders"][i]
        cache = state.layers[i]
        if _DYN_STEP_IMPL == "pallas_fused" and "w" in lp["mha"]["Wq"] and (
            _fused_step_eligible(cfg, cache)
        ):
            # opt-in: dyn + LN2 + cross-attention in ONE kernel (measured
            # slower than the default at production shapes — see
            # set_dyn_step_impl; quantized Wq/out_linear nodes fall back,
            # as do cache shapes whose footprint overflows scoped VMEM)
            y, cache = _dyn_cross_fused_step(
                lp, cfg, cache, y, pos, dtype, reorder,
                dst=None if prev is None else prev[i], in_place=in_place,
                enc_mask=state.enc_mask, group=group,
            )
        else:
            x2 = layernorm(lp["norm_1"], y, cfg.ln_eps)
            dyn, cache = _dyn_exp_step(
                lp["dyn_exp"], cfg, cache, x2, pos, dtype, reorder,
                dst=None if prev is None else prev[i],
                in_place=in_place,
            )
            y = y + dyn
            x2 = layernorm(lp["norm_2"], y, cfg.ln_eps)
            y = y + _cross_attention_step(
                lp["mha"], cfg, cache, x2, state.enc_mask, dtype, group
            )
        x2 = layernorm(lp["norm_3"], y, cfg.ln_eps)
        h = jax.nn.relu(linear(lp["ff"]["linear_1"], x2, dtype))
        y = y + linear(lp["ff"]["linear_2"], h, dtype)
        y_list.append(y)
        new_layers.append(cache)

    cat = jnp.concatenate(y_list, axis=-1)
    y = y + linear(params["dec_reduce_group"], cat, dtype)
    y = layernorm(params["dec_reduce_norm"], y, cfg.ln_eps)
    logits = linear(params["vocab_linear"], y, dtype)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return log_probs, DecState(layers=new_layers, enc_mask=state.enc_mask)

