"""Swin Transformer backbone, functional JAX/TPU rebuild.

Capability parity with the reference's modified Swin (reference:
models/swin_transformer_mod.py:670-827 `SwinTransformer`, classification head
removed — the model emits the final token grid (B, H/32*W/32, 8*embed_dim)).

TPU-first design decisions (not a torch translation):
- NHWC layout end to end; the patch-embed conv (stride == kernel) is computed as a
  space-to-depth reshape + one MXU matmul (mathematically identical to the
  reference's Conv2d at models/swin_transformer_mod.py:611-667);
- window partition/reverse are pure reshape/transposes; the shifted-window roll is
  `jnp.roll`, which XLA lowers to cheap HBM-free slicing;
- relative-position-bias gather and shifted-window attention masks are precomputed
  as static constants at trace time (the reference builds them as buffers in
  __init__, models/swin_transformer_mod.py:198-213, :364-395);
- attention runs per (window, head) as batched MXU matmuls over 144-token
  windows; at inference, attention_impl='fused' replaces whole blocks with the
  Pallas kernels in ops/swin_block_fused.py (one VMEM pass per window strip for
  stages 0/1, attention-half + MLP-half for stage 2) — the serving default in
  bench.py and opt-in via --attention_impl on the CLIs.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SwinConfig
from .common import RngStream, dropout, layernorm, layernorm_init, linear

# ---------------------------------------------------------------------------
# static (non-parameter) structures
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def relative_position_index(window_size: int) -> np.ndarray:
    """(Wh*Ww, Wh*Ww) gather indices into the (2W-1)^2 bias table
    (reference models/swin_transformer_mod.py:198-213)."""
    coords = np.stack(
        np.meshgrid(np.arange(window_size), np.arange(window_size), indexing="ij")
    )  # 2, W, W
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window_size - 1
    rel[:, :, 1] += window_size - 1
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1)  # N, N


@functools.lru_cache(maxsize=None)
def shift_attn_mask(resolution: int, window_size: int, shift_size: int) -> np.ndarray:
    """Additive (-100/0) mask (nW, N, N) for wrap-around windows after the cyclic
    shift (reference models/swin_transformer_mod.py:364-395)."""
    img_mask = np.zeros((resolution, resolution))
    slices = (
        slice(0, -window_size),
        slice(-window_size, -shift_size),
        slice(-shift_size, None),
    )
    cnt = 0
    for h in slices:
        for w in slices:
            img_mask[h, w] = cnt
            cnt += 1
    nw = resolution // window_size
    windows = (
        img_mask.reshape(nw, window_size, nw, window_size)
        .transpose(0, 2, 1, 3)
        .reshape(-1, window_size * window_size)
    )
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def window_transition_perm(
    res: int, window: int, from_shift: int, to_shift: int
) -> np.ndarray:
    """Token permutation taking a (window-partitioned, cyclically pre-rolled by
    `from_shift`) layout directly to the `to_shift` layout: one static gather
    replaces the reverse -> roll -> partition chain between consecutive Swin
    blocks (each a full HBM pass; the composed permutation is a single pass).

    perm[i] = flat index in the FROM layout of the token that position i of
    the TO layout holds. Both layouts flatten (nW, window, window) row-major
    over a (res, res) grid rolled by (-shift, -shift)."""
    grid = np.arange(res * res).reshape(res, res)

    def layout(shift):
        rolled = np.roll(grid, (-shift, -shift), axis=(0, 1))
        return (
            rolled.reshape(res // window, window, res // window, window)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )

    src = layout(from_shift)  # FROM position j holds spatial token src[j]
    dst = layout(to_shift)  # TO position i needs spatial token dst[i]
    inv = np.empty_like(src)
    inv[src] = np.arange(src.size)
    return inv[dst].astype(np.int32)


@functools.lru_cache(maxsize=None)
def transition_pieces(res: int, window: int, from_shift: int, to_shift: int):
    """Decompose window_transition_perm into a KERNEL-FOLDABLE form: every
    output window of the TO layout draws its tokens from a fixed 2x2
    neighborhood of FROM windows (row offsets dr, col offsets dc — identical
    for every window thanks to the cyclic roll), through a single constant
    one-hot matrix P4 (n, 4n) shared by all windows/images.

    Returns (dr, dc, P4): dr/dc are 2-tuples of signed window offsets, and
    P4 @ vstack(src[dr0,dc0], src[dr0,dc1], src[dr1,dc0], src[dr1,dc1])
    reproduces the permuted window exactly (one-hot rows select source
    tokens; exact in bf16 since 1.0*x accumulates one term). This is what
    lets the shift transition ride the MXU inside the fused block kernels
    (ops/swin_block_fused.py transition mode) instead of running as a
    gather between transposes at the XLA level — the round-3 profile showed
    those transpose+gather+transpose chains cost ~8 ms/fwd at b32."""
    perm = window_transition_perm(res, window, from_shift, to_shift)
    n = window * window
    W = res // window
    assert W >= 2, "transition folding needs a multi-window grid"
    src_win = perm.reshape(-1, n) // n  # (nW, n) source window per out token
    src_loc = perm.reshape(-1, n) % n

    def signed(o):  # window offset mod W -> signed representative
        return o if o <= W // 2 else o - W

    drs, dcs = set(), set()
    for w in range(W * W):
        I, J = divmod(w, W)
        for s in np.unique(src_win[w]):
            sr, sc = divmod(int(s), W)
            drs.add(signed((sr - I) % W))
            dcs.add(signed((sc - J) % W))
    dr, dc = tuple(sorted(drs)), tuple(sorted(dcs))
    assert len(dr) <= 2 and len(dc) <= 2, (dr, dc)
    dr = dr if len(dr) == 2 else dr * 2
    dc = dc if len(dc) == 2 else dc * 2
    P4 = np.zeros((n, 4 * n), np.float32)
    for p in range(n):
        s, loc = int(src_win[0][p]), int(src_loc[0][p])
        sr, sc = divmod(s, W)
        k = dr.index(signed(sr % W)) * 2 + dc.index(signed(sc % W))
        P4[p, k * n + loc] = 1.0
    # verify position-independence: every window's sources follow window 0's
    # (piece index and local position both)
    for w in range(W * W):
        I, J = divmod(w, W)
        for p in range(n):
            sr, sc = divmod(int(src_win[w][p]), W)
            k0 = int(np.argmax(P4[p])) // n
            assert signed((sr - I) % W) == dr[k0 // 2], (w, p)
            assert signed((sc - J) % W) == dc[k0 % 2], (w, p)
            assert int(src_loc[w][p]) == int(np.argmax(P4[p])) % n, (w, p)
    return dr, dc, P4


def _window_transition(
    xw: jnp.ndarray, b: int, res: int, window: int, from_shift: int,
    to_shift: int,
) -> jnp.ndarray:
    """(B*nW, n, C) in from_shift window layout -> to_shift window layout."""
    if from_shift == to_shift:
        return xw
    n = window * window
    c = xw.shape[-1]
    perm = jnp.asarray(window_transition_perm(res, window, from_shift, to_shift))
    flat = xw.reshape(b, (res * res // n) * n, c)
    return jnp.take(flat, perm, axis=1).reshape(-1, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _window_transition_diff(
    xw: jnp.ndarray, b: int, res: int, window: int, from_shift: int,
    to_shift: int,
) -> jnp.ndarray:
    """_window_transition with a gather-only VJP. XLA's automatic VJP of the
    permutation gather is a scatter, which lowers catastrophically on TPU
    (measured: an 18-transition stage-2-shaped chain costs 87 ms/step fwd+bwd
    through the scatter vs 5.4 ms through the inverse gather at b16). The
    inverse of window_transition_perm(f, t) is exactly
    window_transition_perm(t, f) (both are layout(f)^-1 . layout(t)
    compositions), so the cotangent transition is another single gather."""
    return _window_transition(xw, b, res, window, from_shift, to_shift)


def _wt_fwd(xw, b, res, window, from_shift, to_shift):
    return _window_transition(xw, b, res, window, from_shift, to_shift), None


def _wt_bwd(b, res, window, from_shift, to_shift, _, g):
    return (_window_transition(g, b, res, window, to_shift, from_shift),)


_window_transition_diff.defvjp(_wt_fwd, _wt_bwd)


# Transition implementation for the TRAIN window-resident runner: "gather"
# (XLA jnp.take with a gather-only VJP, _window_transition_diff) or "kernel"
# (standalone Pallas permute kernel riding the MXU one-hot dots, VJP = the
# same kernel with the inverse transition). Bitwise identical; unlike the
# inference stages the transition can't fold into the next block's kernel
# because the train kernels' custom VJPs save the post-transition x.
_TRAIN_TRANSITION_IMPL = "gather"


def set_train_transition_impl(impl: str) -> None:
    global _TRAIN_TRANSITION_IMPL
    assert impl in ("gather", "kernel"), impl
    _TRAIN_TRANSITION_IMPL = impl


def get_train_transition_impl() -> str:
    return _TRAIN_TRANSITION_IMPL


def _apply_transition_kernel(xw, res, window, from_shift, to_shift):
    from ..ops.swin_block_fused import window_transition_fused

    dr, dc, P4 = transition_pieces(res, window, from_shift, to_shift)
    return window_transition_fused(
        xw, jnp.asarray(P4), (dr, dc, res // window)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _window_transition_kernel(
    xw: jnp.ndarray, b: int, res: int, window: int, from_shift: int,
    to_shift: int,
) -> jnp.ndarray:
    """_window_transition as a standalone Pallas permute kernel
    (ops/swin_block_fused.py window_transition_fused): one read + one write of
    x replaces XLA's transpose -> shared-index row gather -> transpose chain,
    and the cotangent is the same kernel with the inverse transition (the
    inverse of window_transition_perm(f, t) is window_transition_perm(t, f))."""
    return _apply_transition_kernel(xw, res, window, from_shift, to_shift)


def _wtk_fwd(xw, b, res, window, from_shift, to_shift):
    return _apply_transition_kernel(
        xw, res, window, from_shift, to_shift
    ), None


def _wtk_bwd(b, res, window, from_shift, to_shift, _, g):
    return (_apply_transition_kernel(g, res, window, to_shift, from_shift),)


_window_transition_kernel.defvjp(_wtk_fwd, _wtk_bwd)


def _window_transition_train(
    xw: jnp.ndarray, b: int, res: int, window: int, from_shift: int,
    to_shift: int,
) -> jnp.ndarray:
    """Differentiable window transition for the train window-resident runner,
    dispatching on the train-transition impl flag."""
    if from_shift == to_shift:
        return xw
    if _TRAIN_TRANSITION_IMPL == "kernel" and res // window >= 2:
        return _window_transition_kernel(
            xw, b, res, window, from_shift, to_shift
        )
    return _window_transition_diff(xw, b, res, window, from_shift, to_shift)


def _rel_bias_take(table, window: int):
    idx = jnp.asarray(relative_position_index(window).reshape(-1))
    return jnp.take(table, idx, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _rel_bias_gather_fn(table, window: int):
    """Differentiable rel-pos-bias table gather whose backward is a one-hot
    MXU matmul instead of XLA's serialized scatter-add (measured on the v5e:
    18 Swin-L stage-2 bias gathers fwd+bwd drop 5.3 -> 3.5 ms). Exact up to
    f32 summation order (each table bucket accumulates its ~n^2/(2W-1)^2
    cotangent rows through an fp32 dot with one-hot weights).

    A module-level custom_vjp (window static) — NOT a per-window closure
    cached with lru_cache: a cached closure built while an outer jit trace is
    live pins that trace's tracers in the cache and leaks them into later
    traces (manifested as 'No constant handler for DynamicJaxprTracer' when
    the scan branch lowered under a jitted train step)."""
    return _rel_bias_take(table, window)


def _rbg_fwd(table, window):
    return _rel_bias_take(table, window), None


def _rbg_bwd(window, _, g):
    nbuckets = (2 * window - 1) ** 2
    idx = relative_position_index(window).reshape(-1)
    onehot = jnp.asarray(
        (np.arange(nbuckets)[:, None] == idx[None, :]).astype(np.float32)
    )
    return (onehot @ g.astype(jnp.float32),)


_rel_bias_gather_fn.defvjp(_rbg_fwd, _rbg_bwd)


def _rel_bias_gather(window: int):
    """Compatibility shim: returns a gather callable for `window`."""
    return functools.partial(_rel_bias_gather_fn, window=window)


def expand_rel_bias(table, window: int):
    """(table, heads) rel-pos table -> the (heads, n, n) f32 bias tensor the
    attention paths consume (same take/reshape/transpose the per-call path
    runs, so values are bit-identical)."""
    n = window * window
    heads = table.shape[-1]
    return (
        _rel_bias_take(table, window)
        .reshape(n, n, heads)
        .transpose(2, 0, 1)
        .astype(jnp.float32)
    )


def prepare_inference_params(params, cfg: SwinConfig):
    """Returns a copy of a Swin params tree with each block's relative-
    position bias PRE-EXPANDED to `rel_bias_x` (the (heads, n, n) f32 tensor
    attention consumes). The per-call gather + (n, n, heads)->(heads, n, n)
    relayout of every block's bias is ~2.4 ms/fwd at b32 on the v5e (HLO
    profile: the f32[144,144,h] transpose-copies and their gathers are most
    of the backbone's 'data formatting' bucket), re-done on every call even
    though it only depends on the params. Inference paths use `rel_bias_x`
    when present; values are bit-identical to the per-call expansion.

    INFERENCE ONLY: training grads flow to the table (`rel_bias`), so feeding
    prepared params to a train step would silently train a stale copy; don't
    save prepared trees to checkpoints either. Footprint: ~47 MB f32 for
    Swin-L/384. The reference recomputes the gather per forward
    (models/swin_transformer_mod.py:241-247); on TPU the relayout is the
    cost, so it's hoisted."""
    params = dict(params)
    stages = []
    for i, stage in enumerate(params["stages"]):
        stage = dict(stage)
        blocks = []
        for j, bp in enumerate(stage["blocks"]):
            window, _ = effective_window(cfg, i, j)
            bp = dict(bp)
            attn = dict(bp["attn"])
            attn["rel_bias_x"] = expand_rel_bias(attn["rel_bias"], window)
            bp["attn"] = attn
            blocks.append(bp)
        stage["blocks"] = blocks
        stages.append(stage)
    params["stages"] = stages
    return params


def effective_window(cfg: SwinConfig, stage: int, block: int):
    """Per-block (window_size, shift_size): when the stage resolution is <= the
    window, the whole grid is one window and the shift is disabled
    (reference models/swin_transformer_mod.py:337-340)."""
    res = cfg.stage_resolution(stage)[0]
    window = cfg.window_size
    shift = 0 if block % 2 == 0 else cfg.window_size // 2
    if res <= window:
        window = res
        shift = 0
    return window, shift


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _tn(rng, shape):
    return 0.02 * jax.random.truncated_normal(rng, -2.0, 2.0, shape, jnp.float32)


def _linear_tn(rng, d_in, d_out, bias=True):
    p = {"w": _tn(rng, (d_in, d_out))}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def swin_init(rng, cfg: SwinConfig):
    """trunc_normal(0.02) weights, zero biases, LN ones/zeros
    (reference models/swin_transformer_mod.py:782-790). NOTE: the reference
    end-to-end model immediately re-inits everything >1-dim with xavier_uniform_
    (models/End_ExpansionNet_v2.py:112-114); real runs always load pretrained
    weights, so init only seeds shape structure here."""
    keys = RngStream(rng)
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.in_chans
    params = {
        "patch_embed": {
            "proj": _linear_tn(keys.next(), patch_dim, cfg.embed_dim),
            "norm": layernorm_init(cfg.embed_dim) if cfg.patch_norm else None,
        },
        "stages": [],
        "norm": layernorm_init(cfg.num_features),
    }
    if cfg.ape:
        n = cfg.patches_resolution[0] * cfg.patches_resolution[1]
        params["ape"] = _tn(keys.next(), (1, n, cfg.embed_dim))
    for i, depth in enumerate(cfg.depths):
        dim = cfg.stage_dim(i)
        heads = cfg.num_heads[i]
        blocks = []
        for j in range(depth):
            window, _ = effective_window(cfg, i, j)
            table = (2 * window - 1) ** 2
            blocks.append(
                {
                    "norm1": layernorm_init(dim),
                    "attn": {
                        "qkv": _linear_tn(keys.next(), dim, 3 * dim, bias=cfg.qkv_bias),
                        "proj": _linear_tn(keys.next(), dim, dim),
                        "rel_bias": _tn(keys.next(), (table, heads)),
                    },
                    "norm2": layernorm_init(dim),
                    "mlp": {
                        "fc1": _linear_tn(keys.next(), dim, int(dim * cfg.mlp_ratio)),
                        "fc2": _linear_tn(keys.next(), int(dim * cfg.mlp_ratio), dim),
                    },
                }
            )
        stage = {"blocks": blocks}
        if i < cfg.num_layers - 1:
            stage["downsample"] = {
                "norm": layernorm_init(4 * dim),
                "reduction": {"w": _tn(keys.next(), (4 * dim, 2 * dim))},
            }
        params["stages"].append(stage)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, window*window, C)
    (reference models/swin_transformer_mod.py:123-138)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def _window_reverse(windows: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """inverse of _window_partition (reference models/swin_transformer_mod.py:141-157)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // window // window)
    x = windows.reshape(b, h // window, w // window, window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def window_attention(
    p,
    x: jnp.ndarray,
    num_heads: int,
    window: int,
    attn_mask: Optional[jnp.ndarray],
    qk_scale: Optional[float],
    rngs: RngStream,
    attn_drop: float,
    proj_drop: float,
    train: bool,
    dtype=None,
    impl: str = "xla",
) -> jnp.ndarray:
    """W-MSA with relative position bias (reference models/swin_transformer_mod.py:222-272).

    x: (B*nW, N, C) with N = window*window. attn_mask: (nW, N, N) additive or None.
    """
    bw, n, c = x.shape
    dk = c // num_heads
    scale = qk_scale if qk_scale is not None else dk**-0.5

    if "w_q" in p["qkv"]:  # int8-quantized (deploy/quantization.py)
        from ..deploy.quantization import quantized_matmul

        qkv = quantized_matmul(p["qkv"], x)
    else:
        w = p["qkv"]["w"]
        if dtype is not None:
            x_in, w = x.astype(dtype), w.astype(dtype)
        else:
            x_in = x
        qkv = jnp.dot(x_in, w, preferred_element_type=jnp.float32)
        if "b" in p["qkv"]:
            qkv = qkv + p["qkv"]["b"].astype(qkv.dtype)
        if dtype is not None:
            qkv = qkv.astype(dtype)
    if "rel_bias_x" in p:  # pre-expanded (prepare_inference_params)
        bias = p["rel_bias_x"]
    else:
        idx = jnp.asarray(relative_position_index(window).reshape(-1))
        bias = jnp.take(p["rel_bias"], idx, axis=0).reshape(n, n, num_heads)
        bias = bias.transpose(2, 0, 1)  # (h, n, n)

    if impl == "fused" and not train:
        # block wasn't kernel-eligible (Swin-L stage 3: 1536-dim weights
        # exceed even the half-kernel VMEM budget) — keep the GEMMs in XLA
        # but run the score/softmax/value chain in VMEM per window instead
        # of materializing (B, heads, N, N) fp32 score tensors in HBM
        from ..ops.swin_block_fused import attention_core_fused

        nw = attn_mask.shape[0] if attn_mask is not None else 1
        out = attention_core_fused(
            qkv, bias, attn_mask, num_heads, nw, float(scale)
        )  # (bw, n, c) flat — no head transpose round trip
        rngs.next()  # keep the stream aligned with the XLA path's attn-drop
        out = linear(p["proj"], out, dtype)
        return dropout(rngs.next(), proj_drop, out, train)

    qkv = qkv.reshape(bw, n, 3, num_heads, dk).transpose(2, 0, 3, 1, 4)

    if impl == "pallas" and not (train and attn_drop > 0.0):
        from ..ops.window_attention import window_attention_pallas

        q, k, v = qkv[0], qkv[1], qkv[2]
        nw = attn_mask.shape[0] if attn_mask is not None else 1
        out = window_attention_pallas(
            q, k, v, bias, attn_mask, float(scale), nw
        )  # (bw, h, n, dk)
    else:
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]  # (bw, h, n, dk)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        )
        attn = attn + bias[None]
        if attn_mask is not None:
            nw = attn_mask.shape[0]
            attn = (
                attn.reshape(bw // nw, nw, num_heads, n, n)
                + attn_mask[None, :, None]
            )
            attn = attn.reshape(bw, num_heads, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = dropout(rngs.next(), attn_drop, attn, train)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)

    out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
    out = linear(p["proj"], out, dtype)
    return dropout(rngs.next(), proj_drop, out, train)


def swin_block(
    p,
    cfg: SwinConfig,
    x: jnp.ndarray,
    stage: int,
    block: int,
    block_rng,
    train: bool,
    drop_path_rate: float,
    dtype=None,
) -> jnp.ndarray:
    """One (shifted-)window transformer block
    (reference models/swin_transformer_mod.py:397-449)."""
    rngs = RngStream(block_rng)
    res = cfg.stage_resolution(stage)[0]
    window, shift = effective_window(cfg, stage, block)
    b, l, c = x.shape

    if cfg.attention_impl == "fused" and not train:
        from ..ops import swin_block_fused as sbf

        # w8a8 nodes route through "halves" so the MLP half runs the int8 MXU
        # kernel; attention stays bf16 (dequantized once per call). Eligibility
        # is decided on the COMPUTE dtype (the kernel casts x/weights to it).
        cd = x.dtype if dtype is None else dtype
        a8 = "a8" in p["mlp"]["fc1"]
        if not a8 and sbf.eligible(c, cfg.mlp_ratio, cd):
            return _swin_block_fused_path(
                p, cfg, x, stage, window, shift, dtype, mode="full"
            )
        if sbf.eligible_halves(c, cfg.mlp_ratio, cd):
            return _swin_block_fused_path(
                p, cfg, x, stage, window, shift, dtype, mode="halves"
            )

    # eligibility is decided on the COMPUTE dtype (the kernels cast x/weights
    # to `dtype`), matching _run_stage's remat gate exactly — deciding on
    # x.dtype while x is still f32 would disagree with the gate and could
    # silently drop jax.checkpoint from blocks that then take the XLA path
    train_mode = _fused_train_mode(
        cfg, p, c, train, x.dtype if dtype is None else dtype
    )
    if train_mode is not None:
        # consume the rng stream in the XLA path's exact order (attn-drop,
        # proj-drop, drop-path 1, mlp-drop x2, drop-path 2) so switching
        # impls mid-recipe keeps downstream rngs aligned; the zero-rate
        # dropout keys are unused
        rngs.next(), rngs.next()
        k_dp1 = rngs.next()
        rngs.next(), rngs.next()
        k_dp2 = rngs.next()
        return _swin_block_fused_train_path(
            p, cfg, x, stage, window, shift, dtype,
            drop_path_rate, k_dp1, k_dp2, mode=train_mode,
        )

    shortcut = x
    x = layernorm(p["norm1"], x, cfg.ln_eps).reshape(b, res, res, c)
    if shift > 0:
        x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(shift_attn_mask(res, window, shift))
    else:
        mask = None
    x = _window_partition(x, window)
    x = window_attention(
        p["attn"],
        x,
        cfg.num_heads[stage],
        window,
        mask,
        cfg.qk_scale,
        rngs,
        cfg.attn_drop_rate,
        cfg.drop_rate,
        train,
        dtype,
        impl=cfg.attention_impl,
    )
    x = _window_reverse(x, window, res, res)
    if shift > 0:
        x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
    x = x.reshape(b, l, c)

    x = shortcut + _drop_path(rngs.next(), drop_path_rate, x, train)
    h = layernorm(p["norm2"], x, cfg.ln_eps)
    h = linear(p["mlp"]["fc1"], h, dtype)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
    h = dropout(rngs.next(), cfg.drop_rate, h, train)
    h = linear(p["mlp"]["fc2"], h, dtype)
    h = dropout(rngs.next(), cfg.drop_rate, h, train)
    return x + _drop_path(rngs.next(), drop_path_rate, h, train)


def _swin_block_fused_path(
    p, cfg: SwinConfig, x, stage, window, shift, dtype, mode: str = "full"
):
    """Inference path through the fused block Pallas kernels
    (ops/swin_block_fused.py): roll + window partition stay in XLA (cheap
    layout ops). mode='full' runs LN1+attention+proj+LN2+MLP+residuals in one
    VMEM pass; mode='halves' (weights too big for one kernel, e.g. Swin-L
    stage 2) runs the attention half in window layout and the position-wise
    MLP half over flat rows."""
    from ..ops.swin_block_fused import (
        swin_attn_half_fused,
        swin_block_fused,
        swin_mlp_half_fused,
    )

    b, l, c = x.shape
    res = cfg.stage_resolution(stage)[0]
    heads = cfg.num_heads[stage]
    n = window * window
    xs = x.reshape(b, res, res, c)
    if shift > 0:
        xs = jnp.roll(xs, shift=(-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(shift_attn_mask(res, window, shift))
    else:
        mask = None
    xw = _window_partition(xs, window)
    if dtype is not None:
        xw = xw.astype(dtype)

    if "rel_bias_x" in p["attn"]:  # pre-expanded (prepare_inference_params)
        bias = p["attn"]["rel_bias_x"]
    else:
        idx = jnp.asarray(relative_position_index(window).reshape(-1))
        bias = jnp.take(p["attn"]["rel_bias"], idx, axis=0).reshape(n, n, heads)
        bias = bias.transpose(2, 0, 1)
    dk = c // heads
    scale = cfg.qk_scale if cfg.qk_scale is not None else dk**-0.5
    num_windows = (res // window) ** 2

    if mode == "full":
        out = swin_block_fused(
            xw, p, bias, mask, heads, num_windows, float(scale), cfg.ln_eps
        )
    else:
        out = swin_attn_half_fused(
            xw, p, bias, mask, heads, num_windows, float(scale), cfg.ln_eps
        )
    out = _window_reverse(out, window, res, res)
    if shift > 0:
        out = jnp.roll(out, shift=(shift, shift), axis=(1, 2))
    out = out.reshape(b, l, c)
    if mode != "full":
        out = swin_mlp_half_fused(out, p, cfg.ln_eps)
    return out


# Per-stage override of the fused inference mode, keyed by stage index —
# experiment knob (VERDICT r3 item 4): force a stage onto 'hybrid' (XLA
# qkv/proj/mlp GEMMs + the weights-free attention-core kernel) or 'halves'
# instead of what eligibility picks. Not CLI-exposed; set from bench scripts.
_STAGE_MODE_OVERRIDE: dict = {}


def set_stage_mode_override(overrides: Optional[dict]) -> None:
    global _STAGE_MODE_OVERRIDE
    overrides = dict(overrides or {})
    for k, v in overrides.items():
        if v not in ("full", "halves", "hybrid"):
            raise ValueError(
                f"stage_mode_override[{k!r}] = {v!r}; expected one of "
                "'full' | 'halves' | 'hybrid'"
            )
    _STAGE_MODE_OVERRIDE = overrides


def _stage_fused_mode(stage, cfg: SwinConfig, c: int, dtype, idx=None):
    """Whether ALL of a stage's blocks take the same fused inference path:
    returns 'full' | 'halves' | 'hybrid' | None. Uniformity lets the stage
    run window-resident (see _run_stage_fused_windows)."""
    from ..ops import swin_block_fused as sbf

    a8 = ["a8" in b["mlp"]["fc1"] for b in stage["blocks"]]
    if any(a8) != all(a8):
        return None
    if idx is not None and idx in _STAGE_MODE_OVERRIDE and not any(a8):
        mode = _STAGE_MODE_OVERRIDE[idx]
        # 'full' on a stage whose whole block set exceeds the kernel VMEM
        # budget would overflow scoped VMEM at compile time; fail loudly
        # here instead ('halves'/'hybrid' fit wherever 'halves' does).
        if mode == "full" and not sbf.eligible(c, cfg.mlp_ratio, dtype):
            raise ValueError(
                f"stage_mode_override forces 'full' on stage {idx} "
                f"(c={c}), which exceeds the fused-kernel VMEM budget"
            )
        if mode in ("halves", "hybrid") and not sbf.eligible_halves(
            c, cfg.mlp_ratio, dtype
        ):
            raise ValueError(
                f"stage_mode_override forces {mode!r} on stage {idx} "
                f"(c={c}), which exceeds the halves-kernel VMEM budget"
            )
        return mode
    if not any(a8) and sbf.eligible(c, cfg.mlp_ratio, dtype):
        return "full"
    if sbf.eligible_halves(c, cfg.mlp_ratio, dtype):
        return "halves"
    return None


def _run_stage_fused_windows(
    stage, cfg: SwinConfig, x, i, dtype, mode, xw_in=None, emit_windows=False
):
    """Inference stage execution in WINDOW-RESIDENT layout: x is partitioned
    into windows once at stage entry and stays there; the shift transitions
    between consecutive blocks run as single composed-permutation gathers
    (window_transition_perm) instead of the reverse -> roll -> partition
    relayout chains, and the position-wise MLP half runs directly on the
    window layout (row order is irrelevant to it). Deep stages scan over
    (plain, shifted) block pairs like the XLA path.

    xw_in/emit_windows: the fused stage-boundary path (ops/stage_boundary.py)
    hands stages their input already window-partitioned and consumes their
    output in window layout, skipping the entry partition / exit reverse."""
    from ..ops.swin_block_fused import (
        get_transition_impl as sbf_get_transition_impl,
        swin_attn_half_fused,
        swin_block_fused,
        swin_mlp_half_fused,
    )

    res = cfg.stage_resolution(i)[0]
    heads = cfg.num_heads[i]
    window, _ = effective_window(cfg, i, 0)
    n = window * window
    num_windows = (res // window) ** 2
    if xw_in is not None:
        b, l, c = xw_in.shape[0] // num_windows, res * res, xw_in.shape[-1]
    else:
        b, l, c = x.shape
    dk = c // heads
    scale = float(cfg.qk_scale if cfg.qk_scale is not None else dk**-0.5)
    idx = jnp.asarray(relative_position_index(window).reshape(-1))

    W = res // window
    kernel_trans = sbf_get_transition_impl() == "kernel" and W >= 2

    def block(bp, xw, shift, trans=None):
        """trans: (from_shift, to_shift) — fold that window transition into
        the kernel (transition_pieces one-hot dots) instead of gathering
        between kernels."""
        mask = (
            jnp.asarray(shift_attn_mask(res, window, shift)) if shift > 0 else None
        )
        bias = (
            bp["attn"]["rel_bias_x"]
            if "rel_bias_x" in bp["attn"]
            else jnp.take(bp["attn"]["rel_bias"], idx, axis=0)
            .reshape(n, n, heads)
            .transpose(2, 0, 1)
        )
        if mode == "hybrid":
            # VERDICT r3 item 4 experiment: keep the window-resident layout
            # but run qkv/proj/mlp as XLA GEMMs (measured 67%-of-peak on
            # stage-2 shapes) and only the score/softmax/value chain in the
            # weights-free attention-core kernel. Costs the qkv (3c) and
            # attention-out HBM round trips the full-block kernel avoids;
            # transitions revert to the standalone permutation kernel.
            from ..ops.swin_block_fused import attention_core_fused

            if trans is not None:
                xw = _apply_transition_kernel(
                    xw, res, window, trans[0], trans[1]
                )
            cd = xw.dtype
            xn = layernorm(bp["norm1"], xw, cfg.ln_eps)
            qkv = linear(bp["attn"]["qkv"], xn, cd)
            core = attention_core_fused(
                qkv, bias, mask, heads, num_windows, scale
            )
            xb = xw + linear(bp["attn"]["proj"], core, cd).astype(jnp.float32)
            xb = xb.astype(cd)
            h = layernorm(bp["norm2"], xb, cfg.ln_eps)
            h = linear(bp["mlp"]["fc1"], h, cd)
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
                h.dtype
            )
            h = linear(bp["mlp"]["fc2"], h, cd)
            return (xb.astype(jnp.float32) + h.astype(jnp.float32)).astype(cd)
        tkw = {}
        if trans is not None:
            dr, dc, P4 = transition_pieces(res, window, trans[0], trans[1])
            tkw = dict(transition=(dr, dc, W), p4=jnp.asarray(P4))
        if mode == "full":
            return swin_block_fused(
                xw, bp, bias, mask, heads, num_windows, scale, cfg.ln_eps,
                **tkw,
            )
        xw = swin_attn_half_fused(
            xw, bp, bias, mask, heads, num_windows, scale, cfg.ln_eps, **tkw
        )
        return swin_mlp_half_fused(xw, bp, cfg.ln_eps)

    if xw_in is not None:
        xw = xw_in
    else:
        xw = _window_partition(x.reshape(b, res, res, c), window)
    if dtype is not None:
        xw = xw.astype(dtype)

    # end-of-stage transitions (shift -> 0) have no next block kernel to fold
    # into; run them as the standalone Pallas transition kernel instead of the
    # XLA transpose+gather+transpose chain (1.4 ms at stage-0 b32, profile r3)
    def exit_transition(xw, from_shift):
        if from_shift == 0:
            return xw
        if kernel_trans:
            return _apply_transition_kernel(xw, res, window, from_shift, 0)
        return _window_transition(xw, b, res, window, from_shift, 0)

    blocks = stage["blocks"]
    depth = len(blocks)
    shifts = [effective_window(cfg, i, j)[1] for j in range(depth)]
    if depth < 4:
        cur = 0
        for j in range(depth):
            if kernel_trans and shifts[j] != cur:
                xw = block(blocks[j], xw, shifts[j], trans=(cur, shifts[j]))
            else:
                xw = _window_transition(xw, b, res, window, cur, shifts[j])
                xw = block(blocks[j], xw, shifts[j])
            cur = shifts[j]
        xw = exit_transition(xw, cur)
    else:
        assert depth % 2 == 0 and shifts[0] == 0
        s = shifts[1]
        if kernel_trans and s > 0:
            # pair 1 runs standalone (its plain block has no preceding
            # shifted output to transition from); pairs 2..k scan with both
            # transitions folded into the kernels, leaving the carry in the
            # SHIFTED layout between iterations
            xw = block(blocks[0], xw, 0)
            xw = block(blocks[1], xw, s, trans=(0, s))
            even = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[2::2])
            odd = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[3::2])

            def body(carry, inp):
                pe, po = inp
                h = block(pe, carry, 0, trans=(s, 0))
                h = block(po, h, s, trans=(0, s))
                return h, None

            xw, _ = jax.lax.scan(body, xw, (even, odd))
            xw = exit_transition(xw, s)
        else:
            even = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[0::2])
            odd = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[1::2])

            def body(carry, inp):
                pe, po = inp
                h = block(pe, carry, 0)
                h = _window_transition(h, b, res, window, 0, s)
                h = block(po, h, s)
                h = _window_transition(h, b, res, window, s, 0)
                return h, None

            xw, _ = jax.lax.scan(body, xw, (even, odd))
    if emit_windows:
        return xw
    return _window_reverse(xw, window, res, res).reshape(b, l, c)


def _boundary_fused_plan(params, cfg: SwinConfig, images, train, dtype):
    """Whether the whole inference backbone can run WINDOW-RESIDENT end to
    end through the fused stage-boundary kernels (ops/stage_boundary.py):
    patch embed emits window layout, every multi-window stage runs a fused
    window-resident mode, every downsample merges window layout to window
    layout (even window grids only), and single-window stages (Swin-L stage
    3: 12x12 resolution == one window) pass through since their window
    layout IS the flat layout. Returns the per-stage mode list or None."""
    from ..ops import stage_boundary as sb

    if train or cfg.attention_impl != "fused" or cfg.ape:
        return None
    if sb.get_boundary_impl() != "kernel":
        return None
    pe = params["patch_embed"]
    if pe.get("norm") is None or "w" not in pe["proj"]:
        return None
    eff_dtype = dtype if dtype is not None else images.dtype
    modes = []
    for i in range(cfg.num_layers):
        stage = params["stages"][i]
        if len(stage["blocks"]) == 0:
            return None
        res = cfg.stage_resolution(i)[0]
        window = effective_window(cfg, i, 0)[0]
        if res % window:
            return None
        W = res // window
        mode = _stage_fused_mode(stage, cfg, cfg.stage_dim(i), eff_dtype, idx=i)
        if W > 1 and mode is None:
            return None
        if "downsample" in stage:
            if W % 2 or "w" not in stage["downsample"]["reduction"]:
                return None
            # the merged grid must tile the NEXT stage's window exactly
            if (res // 2) % effective_window(cfg, i + 1, 0)[0]:
                return None
            if effective_window(cfg, i + 1, 0)[0] != window:
                return None
        modes.append(mode)
    return modes


def _swin_apply_window_resident(params, cfg: SwinConfig, images, dtype, modes):
    """Inference forward with ALL stage boundaries fused (see
    _boundary_fused_plan): activations enter window layout at the patch
    embed kernel and only leave it at the final LayerNorm."""
    from ..ops import stage_boundary as sb

    b, h, w, cin = images.shape
    ps = cfg.patch_size
    window = effective_window(cfg, 0, 0)[0]
    x = images.reshape(b, h // ps, ps, w // ps, ps, cin)
    x_s2d = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // ps, w // ps, ps * ps * cin
    )
    if dtype is not None:
        x_s2d = x_s2d.astype(dtype)
    xw = sb.patch_embed_fused(
        x_s2d, params["patch_embed"]["proj"], params["patch_embed"]["norm"],
        window, cfg.ln_eps,
    )

    total = sum(cfg.depths)
    dpr = [cfg.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
    rngs = RngStream(None)
    blk_idx = 0
    for i in range(cfg.num_layers):
        stage = params["stages"][i]
        depth = cfg.depths[i]
        stage_dpr = dpr[blk_idx : blk_idx + depth]
        blk_idx += depth
        res = cfg.stage_resolution(i)[0]
        W = res // window
        n = window * window
        if modes[i] is not None:
            xw = _run_stage_fused_windows(
                stage, cfg, None, i, dtype, modes[i], xw_in=xw,
                emit_windows=True,
            )
        else:
            # single-window stage (W == 1): window layout == flat layout
            x = _run_stage(
                stage, cfg, xw.reshape(b, n, xw.shape[-1]), i, rngs, False,
                stage_dpr, dtype, False,
            )
            xw = x.reshape(b, n, x.shape[-1])
        if "downsample" in stage:
            xw = sb.downsample_fused(
                xw, stage["downsample"]["norm"], stage["downsample"]["reduction"],
                W, window, cfg.ln_eps,
            )
    c_last = xw.shape[-1]
    res_last = cfg.stage_resolution(cfg.num_layers - 1)[0]
    W_last = res_last // window
    if W_last > 1:
        x = _window_reverse(xw, window, res_last, res_last).reshape(
            b, res_last * res_last, c_last
        )
    else:
        x = xw.reshape(b, window * window, c_last)
    return layernorm(params["norm"], x, cfg.ln_eps)


def _fused_train_mode(cfg: SwinConfig, p, c: int, train: bool, dtype):
    """Which fused training (custom-VJP) path swin_block will take:
    'full' (whole-block kernel, stage weights fit VMEM — Swin-L 0/1),
    'halves' (attention-half + MLP-half kernels — Swin-L stage 2), or None
    (XLA path). Requires dense weights and zero attn/MLP dropout (the
    reference recipe, train.py:396-398)."""
    if not (
        cfg.attention_impl == "fused"
        and train
        and cfg.drop_rate == 0.0
        and cfg.attn_drop_rate == 0.0
        and "w" in p["attn"]["qkv"]
    ):
        return None
    from ..ops import swin_block_fused as sbf

    if sbf.eligible(c, cfg.mlp_ratio, dtype):
        return "full"
    if sbf.eligible_halves(c, cfg.mlp_ratio, dtype):
        return "halves"
    return None


def _fused_train_active(cfg: SwinConfig, p, c: int, train: bool, dtype) -> bool:
    return _fused_train_mode(cfg, p, c, train, dtype) is not None


def _stage_fused_train_mode(stage, cfg: SwinConfig, c: int, train: bool, dtype):
    """Uniform fused-train mode across a stage's blocks ('full'/'halves'), or
    None when any block is ineligible (quantized weights, nonzero dropout) or
    the modes disagree — the stage then runs block-by-block as before."""
    modes = [
        _fused_train_mode(cfg, bp, c, train, dtype) for bp in stage["blocks"]
    ]
    if modes and modes[0] is not None and all(m == modes[0] for m in modes):
        return modes[0]
    return None


def _run_stage_fused_windows_train(
    stage, cfg: SwinConfig, x, i, rngs: RngStream, stage_dpr, dtype, mode
):
    """Training-stage execution in WINDOW-RESIDENT layout — the train-side
    counterpart of _run_stage_fused_windows: x is partitioned into windows
    once at stage entry, the shift transitions between consecutive blocks run
    as single permutation gathers with gather-only VJPs
    (_window_transition_diff) instead of per-block reverse -> roll ->
    partition relayout chains (whose automatic backwards replay the same HBM
    passes, and whose gather form would backprop through an XLA scatter), and
    the rel-pos bias gather backward rides the MXU (_rel_bias_gather).

    Numerically identical to composing _swin_block_fused_train_path per block:
    transitions are pure data movement (rows stay image-major, so the
    per-image stochastic-depth scales keep their row-block structure), and the
    rng-draw order below mirrors _run_stage + swin_block exactly so the drawn
    drop-path masks coincide with the XLA path under the same keys."""
    from ..ops.swin_block_fused import (
        swin_attn_half_fused_train,
        swin_block_fused_train,
        swin_mlp_half_fused_train,
    )

    b, l, c = x.shape
    res = cfg.stage_resolution(i)[0]
    heads = cfg.num_heads[i]
    window, _ = effective_window(cfg, i, 0)
    n = window * window
    num_windows = (res // window) ** 2
    dk = c // heads
    scale = float(cfg.qk_scale if cfg.qk_scale is not None else dk**-0.5)
    gather_bias = _rel_bias_gather(window)
    def dp_scale(key, rate):
        # same per-image multiplier _drop_path would draw from this key
        if key is None:
            return jnp.ones((b,), jnp.float32)
        keep = 1.0 - rate
        mask_b = jax.random.bernoulli(key, keep, (b,))
        return jnp.where(mask_b, 1.0 / keep, 0.0).astype(jnp.float32)

    def block(bp, xw, shift, block_rng, rate):
        # consume the rng stream in swin_block's exact order (attn-drop,
        # proj-drop, drop-path 1, mlp-drop x2, drop-path 2)
        rs = RngStream(block_rng)
        rs.next(), rs.next()
        k_dp1 = rs.next()
        rs.next(), rs.next()
        k_dp2 = rs.next()
        mask = (
            jnp.asarray(shift_attn_mask(res, window, shift))
            if shift > 0
            else None
        )
        bias = gather_bias(bp["attn"]["rel_bias"]).reshape(n, n, heads)
        bias = bias.transpose(2, 0, 1)
        m1 = dp_scale(k_dp1, rate)  # per-image (B,): the kernels' contract
        if mode == "full":
            m2 = dp_scale(k_dp2, rate)
            p_used = {
                "norm1": bp["norm1"],
                "attn": {"qkv": bp["attn"]["qkv"], "proj": bp["attn"]["proj"]},
                "norm2": bp["norm2"],
                "mlp": bp["mlp"],
            }
            return swin_block_fused_train(
                xw, p_used, bias, mask, m1, m2, heads, num_windows, scale,
                cfg.ln_eps,
            )
        p_attn = {
            "norm1": bp["norm1"],
            "attn": {"qkv": bp["attn"]["qkv"], "proj": bp["attn"]["proj"]},
        }
        x2 = swin_attn_half_fused_train(
            xw, p_attn, bias, mask, m1, heads, num_windows, scale, cfg.ln_eps
        )
        p_mlp = {"norm2": bp["norm2"], "mlp": bp["mlp"]}
        return swin_mlp_half_fused_train(
            x2.reshape(-1, c), p_mlp, dp_scale(k_dp2, rate), cfg.ln_eps,
            num_windows * n,
        ).reshape(-1, n, c)

    xw = _window_partition(x.reshape(b, res, res, c), window)
    if dtype is not None:
        xw = xw.astype(dtype)

    blocks = stage["blocks"]
    depth = len(blocks)
    shifts = [effective_window(cfg, i, j)[1] for j in range(depth)]
    if depth < 4:
        cur = 0
        for j in range(depth):
            xw = _window_transition_train(xw, b, res, window, cur, shifts[j])
            xw = block(blocks[j], xw, shifts[j], rngs.next(), stage_dpr[j])
            cur = shifts[j]
        xw = _window_transition_train(xw, b, res, window, cur, 0)
    else:
        assert depth % 2 == 0 and shifts[0] == 0
        s = shifts[1]
        even = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[0::2])
        odd = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[1::2])
        n_pairs = depth // 2
        rate_e = jnp.asarray(stage_dpr[0::2], jnp.float32)
        rate_o = jnp.asarray(stage_dpr[1::2], jnp.float32)
        use_rng = rngs.next() is not None
        if use_rng:
            keys_e = jnp.stack([rngs.next() for _ in range(n_pairs)])
            keys_o = jnp.stack([rngs.next() for _ in range(n_pairs)])
        else:
            keys_e = keys_o = jnp.zeros((n_pairs, 2), jnp.uint32)

        def body(carry, inp):
            pe, po, de, do, ke, ko = inp
            h = block(pe, carry, 0, ke if use_rng else None, de)
            h = _window_transition_train(h, b, res, window, 0, s)
            h = block(po, h, s, ko if use_rng else None, do)
            h = _window_transition_train(h, b, res, window, s, 0)
            return h, None

        xw, _ = jax.lax.scan(
            body, xw, (even, odd, rate_e, rate_o, keys_e, keys_o)
        )
    return _window_reverse(xw, window, res, res).reshape(b, l, c)


def _swin_block_fused_train_path(
    p, cfg: SwinConfig, x, stage, window, shift, dtype, drop_path_rate,
    k_dp1, k_dp2, mode: str = "full",
):
    """Training path through the fused kernels + their custom VJPs
    (ops/swin_block_fused.swin_block_fused_train for mode='full';
    swin_attn_half_fused_train + swin_mlp_half_fused_train for mode='halves'
    — stages whose full weight set exceeds VMEM, Swin-L stage 2). Layout ops
    (roll, window partition/reverse) and the rel-pos bias gather stay in XLA,
    so the bias TABLE gradient flows through the gather's own VJP; the
    per-image stochastic-depth scales are drawn here with the same keys the
    XLA path would use."""
    from ..ops.swin_block_fused import (
        swin_attn_half_fused_train,
        swin_block_fused_train,
        swin_mlp_half_fused_train,
    )

    b, l, c = x.shape
    res = cfg.stage_resolution(stage)[0]
    heads = cfg.num_heads[stage]
    n = window * window
    xs = x.reshape(b, res, res, c)
    if shift > 0:
        xs = jnp.roll(xs, shift=(-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(shift_attn_mask(res, window, shift))
    else:
        mask = None
    xw = _window_partition(xs, window)
    if dtype is not None:
        xw = xw.astype(dtype)

    bias = _rel_bias_gather(window)(p["attn"]["rel_bias"]).reshape(n, n, heads)
    bias = bias.transpose(2, 0, 1)
    dk = c // heads
    scale = cfg.qk_scale if cfg.qk_scale is not None else dk**-0.5
    num_windows = (res // window) ** 2

    def dp_scale(key):
        # per-image multiplier: where(bernoulli(keep), 1/keep, 0) — the same
        # mask _drop_path draws from this key (models/swin_transformer_mod.py:25-40)
        if key is None:
            return jnp.ones((b,), jnp.float32)
        keep = 1.0 - drop_path_rate
        mask_b = jax.random.bernoulli(key, keep, (b,))
        return jnp.where(mask_b, 1.0 / keep, 0.0).astype(jnp.float32)

    m1 = dp_scale(k_dp1)  # per-image (B,): the kernels' contract

    if mode == "full":
        m2 = dp_scale(k_dp2)
        p_used = {
            "norm1": p["norm1"],
            "attn": {"qkv": p["attn"]["qkv"], "proj": p["attn"]["proj"]},
            "norm2": p["norm2"],
            "mlp": p["mlp"],
        }
        out = swin_block_fused_train(
            xw, p_used, bias, mask, m1, m2, heads, num_windows, float(scale),
            cfg.ln_eps,
        )
    else:
        p_attn = {
            "norm1": p["norm1"],
            "attn": {"qkv": p["attn"]["qkv"], "proj": p["attn"]["proj"]},
        }
        x2 = swin_attn_half_fused_train(
            xw, p_attn, bias, mask, m1, heads, num_windows, float(scale),
            cfg.ln_eps,
        )
        # MLP half is position-wise: run it on the flat window-layout rows
        # (rows stay image-major, so the per-image drop-path scale holds
        # constant over each row block)
        p_mlp = {"norm2": p["norm2"], "mlp": p["mlp"]}
        out = swin_mlp_half_fused_train(
            x2.reshape(-1, c), p_mlp, dp_scale(k_dp2), cfg.ln_eps,
            num_windows * n,
        ).reshape(-1, n, c)
    out = _window_reverse(out, window, res, res)
    if shift > 0:
        out = jnp.roll(out, shift=(shift, shift), axis=(1, 2))
    return out.reshape(b, l, c)


def _drop_path(rng, rate, x: jnp.ndarray, train: bool) -> jnp.ndarray:
    """Stochastic depth, per-sample (reference models/swin_transformer_mod.py:25-40).
    `rate` may be a traced scalar (stage scan feeds per-block rates as scan
    inputs)."""
    if not train or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def patch_merging(p, cfg: SwinConfig, x: jnp.ndarray, stage: int, dtype=None):
    """2x2 neighborhood concat -> LN -> linear 4C->2C
    (reference models/swin_transformer_mod.py:466-510; concat order x0,x1,x2,x3 =
    (even,even),(odd,even),(even,odd),(odd,odd))."""
    res = cfg.stage_resolution(stage)[0]
    b, l, c = x.shape
    x = x.reshape(b, res, res, c)
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(b, l // 4, 4 * c)
    x = layernorm(p["norm"], x, cfg.ln_eps)
    if "w_q" in p["reduction"]:
        from ..deploy.quantization import quantized_matmul

        return quantized_matmul(p["reduction"], x)
    w = p["reduction"]["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y.astype(dtype) if dtype is not None else y


def patch_embed(p, cfg: SwinConfig, images: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Space-to-depth + matmul patch projection, equal to the reference's strided
    Conv2d (reference models/swin_transformer_mod.py:611-655).

    images: (B, H, W, C) NHWC. Returns (B, (H/P)*(W/P), embed_dim).
    """
    b, h, w, c = images.shape
    ps = cfg.patch_size
    x = images.reshape(b, h // ps, ps, w // ps, ps, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // ps) * (w // ps), ps * ps * c)
    x = linear(p["proj"], x, dtype)
    if p["norm"] is not None:
        x = layernorm(p["norm"], x, cfg.ln_eps)
    return x


def swin_apply(
    params,
    cfg: SwinConfig,
    images: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    dtype=None,
    remat: bool = False,
) -> jnp.ndarray:
    """Full backbone: images NHWC (B, img, img, 3) -> tokens (B, 144, num_features)
    (reference models/swin_transformer_mod.py:792-812).

    remat=True wraps each block in jax.checkpoint (the reference's
    swin_use_checkpoint flag, models/swin_transformer_mod.py:591-593).
    """
    if not train:
        modes = _boundary_fused_plan(params, cfg, images, train, dtype)
        if modes is not None:
            return _swin_apply_window_resident(params, cfg, images, dtype, modes)
    rngs = RngStream(rng)
    x = patch_embed(params["patch_embed"], cfg, images, dtype)
    if cfg.ape:
        x = x + params["ape"]
    x = dropout(rngs.next(), cfg.drop_rate, x, train)

    # stochastic depth decay rule (reference models/swin_transformer_mod.py:752-754)
    total = sum(cfg.depths)
    dpr = [cfg.drop_path_rate * i / max(total - 1, 1) for i in range(total)]

    blk_idx = 0
    for i in range(cfg.num_layers):
        stage = params["stages"][i]
        depth = cfg.depths[i]
        stage_dpr = dpr[blk_idx : blk_idx + depth]
        blk_idx += depth
        x = _run_stage(stage, cfg, x, i, rngs, train, stage_dpr, dtype, remat)
        if "downsample" in stage:
            x = patch_merging(stage["downsample"], cfg, x, i, dtype)
    return layernorm(params["norm"], x, cfg.ln_eps)


def _run_stage(
    stage, cfg: SwinConfig, x, i, rngs: RngStream, train, stage_dpr, dtype, remat
):
    """Run one stage's blocks.

    Deep stages (Swin-L stage 2 = 18 blocks) run as a lax.scan over stacked
    (plain, shifted) block pairs: the blocks are structurally identical, so
    scanning shrinks the HLO ~depth/2 x — a large cut to the minutes-long XLA
    compile of the full backbone — at the cost of stacking the stage's weights
    once per forward (~2% of backbone time). Shallow stages stay unrolled.

    Fused-kernel inference stages run window-resident (one layout gather per
    block transition instead of the reverse/roll/partition chains; see
    _run_stage_fused_windows).
    """
    depth = len(stage["blocks"])
    if not train and cfg.attention_impl == "fused" and depth > 0:
        mode = _stage_fused_mode(
            stage, cfg, x.shape[-1], x.dtype if dtype is None else dtype,
            idx=i,
        )
        if mode is not None:
            return _run_stage_fused_windows(stage, cfg, x, i, dtype, mode)
    if train and cfg.attention_impl == "fused" and depth > 0:
        mode = _stage_fused_train_mode(
            stage, cfg, x.shape[-1], train, x.dtype if dtype is None else dtype
        )
        if mode is not None:
            # fused-train blocks self-recompute in their custom VJPs, so this
            # path ignores `remat` exactly like the per-block gating below
            return _run_stage_fused_windows_train(
                stage, cfg, x, i, rngs, stage_dpr, dtype, mode
            )
    if depth < 4:
        for j in range(depth):
            fn = swin_block
            # fused-train blocks carry their own recompute-in-backward custom
            # VJP (saving only x and the mid-block residual) — wrapping them
            # in jax.checkpoint would discard those residuals and replay the
            # whole forward for no memory benefit
            if remat and not _fused_train_active(
                cfg, stage["blocks"][j], x.shape[-1], train,
                x.dtype if dtype is None else dtype,
            ):
                # hashable statics: cfg, stage/block idx, train flag, dtype
                fn = jax.checkpoint(swin_block, static_argnums=(1, 3, 4, 6, 8))
            x = fn(
                stage["blocks"][j], cfg, x, i, j, rngs.next(), train, stage_dpr[j],
                dtype,
            )
        return x

    assert depth % 2 == 0, "swin stages alternate plain/shifted block pairs"
    blocks = stage["blocks"]
    even = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[0::2])
    odd = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[1::2])
    n_pairs = depth // 2
    rate_e = jnp.asarray(stage_dpr[0::2], jnp.float32)
    rate_o = jnp.asarray(stage_dpr[1::2], jnp.float32)
    use_rng = train and rngs.next() is not None
    if use_rng:
        keys_e = jnp.stack([rngs.next() for _ in range(n_pairs)])
        keys_o = jnp.stack([rngs.next() for _ in range(n_pairs)])
    else:
        keys_e = keys_o = jnp.zeros((n_pairs, 2), jnp.uint32)

    def body(carry, inp):
        pe, po, de, do, ke, ko = inp
        h = swin_block(
            pe, cfg, carry, i, 0, ke if use_rng else None, train, de, dtype
        )
        h = swin_block(po, cfg, h, i, 1, ko if use_rng else None, train, do, dtype)
        return h, None

    # fused-train blocks carry their own recompute-in-backward custom VJPs —
    # wrapping the pair body in jax.checkpoint would discard their saved
    # residuals and replay the whole forward for no memory benefit
    if remat and not _fused_train_active(
        cfg, blocks[0], x.shape[-1], train, x.dtype if dtype is None else dtype
    ):
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, (even, odd, rate_e, rate_o, keys_e, keys_o))
    return x
