"""End-to-end model: Swin-L backbone + ExpansionNet v2 caption head.

Rebuild of the reference `End_ExpansionNet_v2` (reference
models/End_ExpansionNet_v2.py:10-209). The split encoder/decoder capability
(reference :455-708, used by quantization and the TRT export) is inherent here:
`forward_enc` / `forward_dec` are already separate pure functions over one params
pytree, so the "split" variants need no duplicate modules.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import captioner as cap
from . import swin


def init(rng, cfg: ModelConfig):
    k1, k2 = jax.random.split(rng)
    return {
        "swin": swin.swin_init(k1, cfg.swin),
        "captioner": cap.captioner_init(k2, cfg.captioner),
    }


def prepare_inference_params(params, cfg: ModelConfig):
    """Copy of an end-to-end params tree with the Swin rel-pos biases
    pre-expanded for inference (swin.prepare_inference_params — ~2.4 ms/fwd
    at b32 saved). Inference only; never feed to a train step or save."""
    return {**params, "swin": swin.prepare_inference_params(params["swin"], cfg.swin)}


def forward_enc(
    params,
    cfg: ModelConfig,
    images: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """images NHWC (B, H, W, 3) -> encoder output (B, 144, d_model)
    (reference models/End_ExpansionNet_v2.py:121-153).

    The end-to-end path never has encoder pads (144 dense visual tokens; the
    reference forces enc_input_num_pads to zeros at :126), so no pad mask is built.
    """
    swin_rng = head_rng = None
    if rng is not None:
        swin_rng, head_rng = jax.random.split(rng)
    feats = swin.swin_apply(
        params["swin"], cfg.swin, images, swin_rng, train, cfg.compute_dtype, remat
    )
    return cap.forward_enc(
        params["captioner"],
        cfg.captioner,
        feats,
        enc_num_pads=None,
        rng=head_rng,
        train=train,
        dtype=cfg.compute_dtype,
    )


def forward_dec(
    params,
    cfg: ModelConfig,
    cross_input: jnp.ndarray,
    dec_input: jnp.ndarray,
    dec_num_pads: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    apply_log_softmax: bool = False,
) -> jnp.ndarray:
    """(reference models/End_ExpansionNet_v2.py:155-209; encoder pads forced to 0)."""
    return cap.forward_dec(
        params["captioner"],
        cfg.captioner,
        cross_input,
        dec_input,
        dec_num_pads=dec_num_pads,
        enc_num_pads=None,
        rng=rng,
        train=train,
        apply_log_softmax=apply_log_softmax,
        dtype=cfg.compute_dtype,
    )


def forward(
    params,
    cfg: ModelConfig,
    images: jnp.ndarray,
    dec_input: jnp.ndarray,
    dec_num_pads: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    apply_log_softmax: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    x = forward_enc(params, cfg, images, enc_rng, train, remat)
    return forward_dec(
        params, cfg, x, dec_input, dec_num_pads, dec_rng, train, apply_log_softmax
    )
