"""Block Static / Dynamic Expansion layers, multi-head attention, feed-forward.

Functional JAX re-design of the ExpansionNet v2 layer library
(reference: models/layers.py:1-309). Parity-critical semantics preserved:

- expansion score z = Q · key(x)^T / sqrt(d_model), then ReLU(z) / ReLU(-z) dual
  paths, forward L1-normalized over keys (+eps) and backward L1-normalized
  (per expansion-group for the static block, full-row for the dynamic block)
  (reference models/layers.py:52-101, :152-204);
- the static block's backward path is NOT masked (reference applies masked_fill
  only on the forward path, models/layers.py:57-58 vs :67-92);
- attention scores are masked additively with -1e4 before softmax
  (reference models/layers.py:284);
- eps = 1e-9 on every normalization denominator (reference models/layers.py:106).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..config import CaptionerConfig
from .common import (
    RngStream,
    dropout,
    embedding_init,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
)

# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def static_expansion_init(rng, cfg: CaptionerConfig):
    ks = jax.random.split(rng, 6)
    d, s = cfg.d_model, cfg.sum_exp_enc
    return {
        "query_exp": embedding_init(ks[0], s, d),
        "bias_exp": embedding_init(ks[1], s, d),
        "key_embed": linear_init(ks[2], d, d),
        "class_a_embed": linear_init(ks[3], d, d),
        "class_b_embed": linear_init(ks[4], d, d),
        "selector_embed": linear_init(ks[5], d, d),
    }


def dynamic_expansion_init(rng, cfg: CaptionerConfig):
    ks = jax.random.split(rng, 7)
    d, e = cfg.d_model, cfg.num_exp_dec
    return {
        "cond_embed": linear_init(ks[0], d, d),
        "query_exp": embedding_init(ks[1], e, d),
        "bias_exp": embedding_init(ks[2], e, d),
        "key_linear": linear_init(ks[3], d, d),
        "class_a_embed": linear_init(ks[4], d, d),
        "class_b_embed": linear_init(ks[5], d, d),
        "selector_embed": linear_init(ks[6], d, d),
    }


def mha_init(rng, cfg: CaptionerConfig):
    ks = jax.random.split(rng, 4)
    d = cfg.d_model
    return {
        "Wq": linear_init(ks[0], d, d),
        "Wk": linear_init(ks[1], d, d),
        "Wv": linear_init(ks[2], d, d),
        "out_linear": linear_init(ks[3], d, d),
    }


def ff_init(rng, cfg: CaptionerConfig):
    k1, k2 = jax.random.split(rng)
    return {
        "linear_1": linear_init(k1, cfg.d_model, cfg.ff),
        "linear_2": linear_init(k2, cfg.ff, cfg.d_model),
    }


def encoder_layer_init(rng, cfg: CaptionerConfig):
    k1, k2 = jax.random.split(rng)
    return {
        "norm_1": layernorm_init(cfg.d_model),
        "norm_2": layernorm_init(cfg.d_model),
        "stc_exp": static_expansion_init(k1, cfg),
        "ff": ff_init(k2, cfg),
    }


def decoder_layer_init(rng, cfg: CaptionerConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "norm_1": layernorm_init(cfg.d_model),
        "norm_2": layernorm_init(cfg.d_model),
        "norm_3": layernorm_init(cfg.d_model),
        "dyn_exp": dynamic_expansion_init(k1, cfg),
        "mha": mha_init(k2, cfg),
        "ff": ff_init(k3, cfg),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _l1_normalize(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    return x / (jnp.sum(x, axis=-1, keepdims=True) + eps)


def _group_l1_normalize(
    x: jnp.ndarray, groups: Sequence[int], eps: float
) -> jnp.ndarray:
    """L1-normalize slices of the last axis independently per expansion group
    (reference models/layers.py:70-92)."""
    parts, start = [], 0
    for g in groups:
        sl = x[..., start : start + g]
        parts.append(_l1_normalize(sl, eps))
        start += g
    return jnp.concatenate(parts, axis=-1)


def static_expansion(
    p,
    cfg: CaptionerConfig,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    rngs: RngStream,
    train: bool,
    dtype=None,
) -> jnp.ndarray:
    """Block Static Expansion (reference models/layers.py:45-102).

    x: (B, S, d). mask: bool (B, sum_exp, S) or None (no pads). The full query/bias
    tables are used in index order — the reference always passes
    n_indexes = arange(sum_exp) (reference models/ExpansionNet_v2.py:80-86) so the
    embedding lookup collapses to the table itself.
    """
    d = cfg.d_model
    rate = cfg.drop.enc
    q = p["query_exp"]["embed"]  # (sum_exp, d)
    bias = p["bias_exp"]["embed"]  # (sum_exp, d)

    x_key = linear(p["key_embed"], x, dtype)  # (B, S, d)
    z = jnp.einsum(
        "ed,bsd->bes",
        q.astype(x_key.dtype),
        x_key,
        preferred_element_type=jnp.float32,
    ) / (d**0.5)
    z = dropout(rngs.next(), rate, z, train)

    a_fw = jax.nn.relu(z)
    b_fw = jax.nn.relu(-z)
    if mask is not None:
        a_fw = jnp.where(mask, a_fw, 0.0)
        b_fw = jnp.where(mask, b_fw, 0.0)
    a_fw = _l1_normalize(a_fw, cfg.eps)
    b_fw = _l1_normalize(b_fw, cfg.eps)

    class_a = (
        jnp.einsum(
            "bes,bsd->bed", a_fw, linear(p["class_a_embed"], x, dtype),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    class_b = (
        jnp.einsum(
            "bes,bsd->bed", b_fw, linear(p["class_b_embed"], x, dtype),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    class_a = dropout(rngs.next(), rate, class_a, train)
    class_b = dropout(rngs.next(), rate, class_b, train)

    # backward path: (B, S, sum_exp), group-normalized, NOT masked (see module doc)
    zt = jnp.swapaxes(z, -1, -2)
    a_bw = _group_l1_normalize(jax.nn.relu(zt), cfg.num_exp_enc_list, cfg.eps)
    b_bw = _group_l1_normalize(jax.nn.relu(-zt), cfg.num_exp_enc_list, cfg.eps)

    n_groups = float(len(cfg.num_exp_enc_list))
    class_a = (
        jnp.einsum("bse,bed->bsd", a_bw, class_a, preferred_element_type=jnp.float32)
        / n_groups
    )
    class_b = (
        jnp.einsum("bse,bed->bsd", b_bw, class_b, preferred_element_type=jnp.float32)
        / n_groups
    )
    class_a = dropout(rngs.next(), rate, class_a, train)
    class_b = dropout(rngs.next(), rate, class_b, train)

    selector = jax.nn.sigmoid(linear(p["selector_embed"], x, dtype).astype(jnp.float32))
    return selector * class_a + (1.0 - selector) * class_b


def dynamic_expansion(
    p,
    cfg: CaptionerConfig,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    rngs: RngStream,
    train: bool,
    dtype=None,
) -> jnp.ndarray:
    """Block Dynamic Expansion (reference models/layers.py:152-204).

    x: (B, T, d). mask: bool (B, T, T) causal(+pad) mask. Each position expands to
    `num_exp` slots conditioned on cond_embed(x).
    """
    b, t, d = x.shape
    e = cfg.num_exp_dec
    rate = cfg.drop.dec

    cond = linear(p["cond_embed"], x, dtype).reshape(b, t, 1, d)
    q = (p["query_exp"]["embed"][None, None] + cond).reshape(b, t * e, d)
    bias = (p["bias_exp"]["embed"][None, None] + cond).reshape(b, t * e, d)

    x_key = linear(p["key_linear"], x, dtype)
    z = jnp.einsum(
        "bqd,btd->bqt", q.astype(x_key.dtype), x_key, preferred_element_type=jnp.float32
    ) / (d**0.5)
    z = dropout(rngs.next(), rate, z, train)  # (B, T*e, T)

    mask_rows = jnp.broadcast_to(mask[:, :, None, :], (b, t, e, t)).reshape(b, t * e, t)
    a_fw = jnp.where(mask_rows, jax.nn.relu(z), 0.0)
    b_fw = jnp.where(mask_rows, jax.nn.relu(-z), 0.0)
    a_fw = _l1_normalize(a_fw, cfg.eps)
    b_fw = _l1_normalize(b_fw, cfg.eps)
    class_a = jnp.einsum(
        "bqt,btd->bqd", a_fw, linear(p["class_a_embed"], x, dtype),
        preferred_element_type=jnp.float32,
    )
    class_b = jnp.einsum(
        "bqt,btd->bqd", b_fw, linear(p["class_b_embed"], x, dtype),
        preferred_element_type=jnp.float32,
    )
    class_a = dropout(rngs.next(), rate, class_a, train)
    class_b = dropout(rngs.next(), rate, class_b, train)

    mask_cols = jnp.broadcast_to(mask[:, :, :, None], (b, t, t, e)).reshape(b, t, t * e)
    zt = jnp.swapaxes(z, -1, -2)  # (B, T, T*e)
    a_bw = jnp.where(mask_cols, jax.nn.relu(zt), 0.0)
    b_bw = jnp.where(mask_cols, jax.nn.relu(-zt), 0.0)
    a_bw = _l1_normalize(a_bw, cfg.eps)
    b_bw = _l1_normalize(b_bw, cfg.eps)
    class_a = jnp.einsum(
        "btq,bqd->btd", a_bw, class_a + bias, preferred_element_type=jnp.float32
    )
    class_b = jnp.einsum(
        "btq,bqd->btd", b_bw, class_b + bias, preferred_element_type=jnp.float32
    )
    class_a = dropout(rngs.next(), rate, class_a, train)
    class_b = dropout(rngs.next(), rate, class_b, train)

    selector = jax.nn.sigmoid(linear(p["selector_embed"], x, dtype).astype(jnp.float32))
    return selector * class_a + (1.0 - selector) * class_b


def multi_head_attention(
    p,
    cfg: CaptionerConfig,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    dtype=None,
) -> jnp.ndarray:
    """Standard MHA with -1e4 additive masking (reference models/layers.py:266-295)."""
    b, tq, d = q.shape
    h, dk = cfg.num_heads, cfg.head_dim
    qp = linear(p["Wq"], q, dtype).reshape(b, tq, h, dk)
    kp = linear(p["Wk"], k, dtype).reshape(b, k.shape[1], h, dk)
    vp = linear(p["Wv"], v, dtype).reshape(b, v.shape[1], h, dk)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qp, kp, preferred_element_type=jnp.float32
    ) / (dk**0.5)
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, cfg.attn_fill)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", attn.astype(vp.dtype), vp, preferred_element_type=jnp.float32
    ).astype(vp.dtype).reshape(b, tq, d)
    return linear(p["out_linear"], out, dtype)


def feed_forward(
    p,
    cfg: CaptionerConfig,
    x: jnp.ndarray,
    rngs: RngStream,
    train: bool,
    dtype=None,
    rate: Optional[float] = None,
) -> jnp.ndarray:
    """linear → relu → dropout → linear (reference models/layers.py:298-308)."""
    h = jax.nn.relu(linear(p["linear_1"], x, dtype))
    h = dropout(rngs.next(), cfg.drop.enc if rate is None else rate, h, train)
    return linear(p["linear_2"], h, dtype)


def encoder_layer(
    p,
    cfg: CaptionerConfig,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    rngs: RngStream,
    train: bool,
    dtype=None,
) -> jnp.ndarray:
    """Pre-LN encoder layer (reference models/layers.py:118-123)."""
    x2 = layernorm(p["norm_1"], x, cfg.ln_eps)
    stc = static_expansion(p["stc_exp"], cfg, x2, mask, rngs, train, dtype)
    x = x + dropout(rngs.next(), cfg.drop.enc, stc.astype(x.dtype), train)
    x2 = layernorm(p["norm_2"], x, cfg.ln_eps)
    ff = feed_forward(p["ff"], cfg, x2, rngs, train, dtype)
    x = x + dropout(rngs.next(), cfg.drop.enc, ff.astype(x.dtype), train)
    return x


def decoder_layer(
    p,
    cfg: CaptionerConfig,
    x: jnp.ndarray,
    cross_x: jnp.ndarray,
    self_mask: jnp.ndarray,
    cross_mask: Optional[jnp.ndarray],
    rngs: RngStream,
    train: bool,
    dtype=None,
) -> jnp.ndarray:
    """Pre-LN decoder layer: dyn-expansion, cross-MHA, FF
    (reference models/layers.py:222-248)."""
    x2 = layernorm(p["norm_1"], x, cfg.ln_eps)
    dyn = dynamic_expansion(p["dyn_exp"], cfg, x2, self_mask, rngs, train, dtype)
    x = x + dropout(rngs.next(), cfg.drop.dec, dyn.astype(x.dtype), train)
    x2 = layernorm(p["norm_2"], x, cfg.ln_eps)
    mha = multi_head_attention(p["mha"], cfg, x2, cross_x, cross_x, cross_mask, dtype)
    x = x + dropout(rngs.next(), cfg.drop.dec, mha.astype(x.dtype), train)
    x2 = layernorm(p["norm_3"], x, cfg.ln_eps)
    ff = feed_forward(p["ff"], cfg, x2, rngs, train, dtype, rate=cfg.drop.dec)
    x = x + dropout(rngs.next(), cfg.drop.dec, ff.astype(x.dtype), train)
    return x
