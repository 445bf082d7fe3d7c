"""ExpansionNet v2 caption head: encoder / decoder stacks with layer-concat fusion.

Functional rebuild of the reference caption models:
- features-in `ExpansionNet_v2` (reference models/ExpansionNet_v2.py:9-156) — encoder
  consumes precomputed visual features (img_feature_dim, default Swin-L 1536);
- end-to-end `End_ExpansionNet_v2` (reference models/End_ExpansionNet_v2.py:10-209) —
  same head fed by the Swin backbone (see models/swin.py and models/end_to_end.py).

Both reference variants share identical head semantics; the encoder pad mask here
uses the correct (B, sum_exp, S_enc) shape from the legacy model
(reference legacy_models/End_ExpansionNet_v2.py:88-91), not the fork's
(B, sum_exp, B) regression (reference models/End_ExpansionNet_v2.py:137).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import CaptionerConfig
from ..ops.masks import causal_pad_mask, pad_mask
from .common import (
    RngStream,
    dropout,
    embedding_init,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
)
from .expansion import (
    decoder_layer,
    decoder_layer_init,
    encoder_layer,
    encoder_layer_init,
)


def captioner_init(rng, cfg: CaptionerConfig):
    """Initialize the caption-head parameter pytree.

    The reference re-initializes every >1-dim parameter with xavier_uniform_ after
    construction (reference models/End_ExpansionNet_v2.py:112-114); biases keep
    zeros here (a deliberate simplification of torch's default bias init — only
    affects training from scratch, never checkpoint loading).
    """
    ks = jax.random.split(rng, 8 + cfg.N_enc + cfg.N_dec)
    params = {
        "input_linear": linear_init(ks[0], cfg.img_feature_dim, cfg.d_model),
        "vocab_linear": linear_init(ks[1], cfg.d_model, cfg.vocab_size),
        "out_embedder": embedding_init(ks[2], cfg.vocab_size, cfg.d_model),
        "pos_encoder": embedding_init(ks[3], cfg.max_seq_len, cfg.d_model),
        "enc_reduce_group": linear_init(ks[4], cfg.d_model * cfg.N_enc, cfg.d_model),
        "enc_reduce_norm": layernorm_init(cfg.d_model),
        "dec_reduce_group": linear_init(ks[5], cfg.d_model * cfg.N_dec, cfg.d_model),
        "dec_reduce_norm": layernorm_init(cfg.d_model),
        "encoders": [
            encoder_layer_init(ks[8 + i], cfg) for i in range(cfg.N_enc)
        ],
        "decoders": [
            decoder_layer_init(ks[8 + cfg.N_enc + i], cfg) for i in range(cfg.N_dec)
        ],
    }
    return params


def forward_enc(
    params,
    cfg: CaptionerConfig,
    features: jnp.ndarray,
    enc_num_pads: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    dtype=None,
) -> jnp.ndarray:
    """Encoder over visual features (reference models/ExpansionNet_v2.py:77-101).

    features: (B, S_enc, img_feature_dim). Returns (B, S_enc, d_model).
    """
    rngs = RngStream(rng)
    b, s, _ = features.shape
    x = dropout(
        rngs.next(), cfg.drop.enc_input, linear(params["input_linear"], features, dtype), train
    )
    mask = None
    if enc_num_pads is not None:
        mask = pad_mask(b, cfg.sum_exp_enc, s, row_pads=None, col_pads=enc_num_pads)
    x_list = []
    for i in range(cfg.N_enc):
        x = encoder_layer(params["encoders"][i], cfg, x, mask, rngs, train, dtype)
        x_list.append(x)
    cat = jnp.concatenate(x_list, axis=-1)
    x = x + dropout(
        rngs.next(), cfg.drop.other, linear(params["enc_reduce_group"], cat, dtype), train
    )
    return layernorm(params["enc_reduce_norm"], x, cfg.ln_eps)


def forward_dec(
    params,
    cfg: CaptionerConfig,
    cross_input: jnp.ndarray,
    dec_input: jnp.ndarray,
    dec_num_pads: Optional[jnp.ndarray] = None,
    enc_num_pads: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    apply_log_softmax: bool = False,
    dtype=None,
) -> jnp.ndarray:
    """Decoder over a full token prefix (reference models/ExpansionNet_v2.py:103-156).

    cross_input: (B, S_enc, d_model) encoder output; dec_input: (B, T) int tokens.
    Returns logits (B, T, vocab) — log-softmaxed when apply_log_softmax.
    """
    rngs = RngStream(rng)
    b, t = dec_input.shape
    self_mask = causal_pad_mask(b, t, dec_num_pads)
    cross_mask = None
    if dec_num_pads is not None or enc_num_pads is not None:
        cross_mask = pad_mask(
            b, t, cross_input.shape[1], row_pads=dec_num_pads, col_pads=enc_num_pads
        )

    # token embedding: dropout(embed(x)) * sqrt(d) (reference models/layers.py:16-17)
    # mode="clip": stray out-of-range token ids clamp (matching the
    # incremental decoder's lookup, decode/cache.py) instead of jnp.take's
    # default NaN fill — keeps full-prefix re-score and decode consistent
    y = jnp.take(params["out_embedder"]["embed"], dec_input, axis=0, mode="clip")
    y = dropout(rngs.next(), cfg.drop.dec_input, y, train) * math.sqrt(float(cfg.d_model))
    y = y + params["pos_encoder"]["embed"][:t][None, :, :]

    y_list = []
    for i in range(cfg.N_dec):
        y = decoder_layer(
            params["decoders"][i], cfg, y, cross_input, self_mask, cross_mask, rngs, train, dtype
        )
        y_list.append(y)
    cat = jnp.concatenate(y_list, axis=-1)
    y = y + dropout(
        rngs.next(), cfg.drop.other, linear(params["dec_reduce_group"], cat, dtype), train
    )
    y = layernorm(params["dec_reduce_norm"], y, cfg.ln_eps)
    y = linear(params["vocab_linear"], y, dtype)
    if apply_log_softmax:
        y = jax.nn.log_softmax(y.astype(jnp.float32), axis=-1)
    return y


def forward(
    params,
    cfg: CaptionerConfig,
    features: jnp.ndarray,
    dec_input: jnp.ndarray,
    enc_num_pads: Optional[jnp.ndarray] = None,
    dec_num_pads: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    apply_log_softmax: bool = False,
    dtype=None,
) -> jnp.ndarray:
    """Full teacher-forced forward (reference models/captioning_model.py:34-37)."""
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    x = forward_enc(params, cfg, features, enc_num_pads, enc_rng, train, dtype)
    return forward_dec(
        params,
        cfg,
        x,
        dec_input,
        dec_num_pads,
        enc_num_pads,
        dec_rng,
        train,
        apply_log_softmax,
        dtype,
    )
