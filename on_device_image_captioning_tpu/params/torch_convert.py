"""Convert reference PyTorch checkpoints (.pth state_dicts) into this framework's
parameter pytrees.

Covers the four reference layouts: full end-to-end `End_ExpansionNet_v2`,
features-in `ExpansionNet_v2`, split encoder/decoder halves, and the Swin-official
pretraining format (detected by a 'model' key — reference train.py:536-539,
data_generator.py:76-83). Layer-removal checkpoint surgery (param_config 1/2) is in
`surgery.py` (reference train.py:305-342).

Weight-layout rules:
- torch nn.Linear weight (out, in) -> jax (in, out) transpose;
- torch Conv2d patch-embed weight (O, C, kh, kw) -> (kh*kw*C, O) matmul form,
  flattened in (u, v, c) patch order to match models/swin.py `patch_embed`;
- nn.Embedding / LayerNorm tensors pass through (LayerNorm weight -> 'scale').
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from ..config import CaptionerConfig, ModelConfig, SwinConfig


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy (no torch import required when
    the input is already numpy)."""
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _lin(sd: Mapping, prefix: str) -> Dict:
    p = {"w": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def _ln(sd: Mapping, prefix: str) -> Dict:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _emb(sd: Mapping, prefix: str) -> Dict:
    return {"embed": _np(sd[prefix + ".weight"])}


def strip_prefixes(sd: Mapping) -> Dict:
    """Drop DDP 'module.' wrappers and ignore non-parameter buffers
    (attn_mask / relative_position_index are rebuilt statically)."""
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^module\.", "", k)
        if k.endswith("attn_mask") or k.endswith("relative_position_index"):
            continue
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# caption head
# ---------------------------------------------------------------------------


def convert_captioner(sd: Mapping, cfg: CaptionerConfig, prefix: str = "") -> Dict:
    """Caption-head params from a reference state_dict
    (name map from models/End_ExpansionNet_v2.py:81-110 module attributes)."""

    def g(name):
        return prefix + name

    params = {
        "input_linear": _lin(sd, g("input_linear")),
        "vocab_linear": _lin(sd, g("vocab_linear")),
        "out_embedder": _emb(sd, g("out_embedder.embed")),
        "pos_encoder": _emb(sd, g("pos_encoder")),
        "enc_reduce_group": _lin(sd, g("enc_reduce_group")),
        "enc_reduce_norm": _ln(sd, g("enc_reduce_norm")),
        "dec_reduce_group": _lin(sd, g("dec_reduce_group")),
        "dec_reduce_norm": _ln(sd, g("dec_reduce_norm")),
        "encoders": [],
        "decoders": [],
    }
    for i in range(cfg.N_enc):
        e = f"{prefix}encoders.{i}."
        params["encoders"].append(
            {
                "norm_1": _ln(sd, e + "norm_1"),
                "norm_2": _ln(sd, e + "norm_2"),
                "stc_exp": {
                    "query_exp": _emb(sd, e + "stc_exp.query_exp_vectors"),
                    "bias_exp": _emb(sd, e + "stc_exp.bias_exp_vectors"),
                    "key_embed": _lin(sd, e + "stc_exp.key_embed"),
                    "class_a_embed": _lin(sd, e + "stc_exp.class_a_embed"),
                    "class_b_embed": _lin(sd, e + "stc_exp.class_b_embed"),
                    "selector_embed": _lin(sd, e + "stc_exp.selector_embed"),
                },
                "ff": {
                    "linear_1": _lin(sd, e + "ff.linear_1"),
                    "linear_2": _lin(sd, e + "ff.linear_2"),
                },
            }
        )
    for i in range(cfg.N_dec):
        d = f"{prefix}decoders.{i}."
        params["decoders"].append(
            {
                "norm_1": _ln(sd, d + "norm_1"),
                "norm_2": _ln(sd, d + "norm_2"),
                "norm_3": _ln(sd, d + "norm_3"),
                "dyn_exp": {
                    "cond_embed": _lin(sd, d + "dyn_exp.cond_embed"),
                    "query_exp": _emb(sd, d + "dyn_exp.query_exp_vectors"),
                    "bias_exp": _emb(sd, d + "dyn_exp.bias_exp_vectors"),
                    "key_linear": _lin(sd, d + "dyn_exp.key_linear"),
                    "class_a_embed": _lin(sd, d + "dyn_exp.class_a_embed"),
                    "class_b_embed": _lin(sd, d + "dyn_exp.class_b_embed"),
                    "selector_embed": _lin(sd, d + "dyn_exp.selector_embed"),
                },
                "mha": {
                    "Wq": _lin(sd, d + "mha.Wq"),
                    "Wk": _lin(sd, d + "mha.Wk"),
                    "Wv": _lin(sd, d + "mha.Wv"),
                    "out_linear": _lin(sd, d + "mha.out_linear"),
                },
                "ff": {
                    "linear_1": _lin(sd, d + "ff.linear_1"),
                    "linear_2": _lin(sd, d + "ff.linear_2"),
                },
            }
        )
    return params


# ---------------------------------------------------------------------------
# swin backbone
# ---------------------------------------------------------------------------


def convert_swin(sd: Mapping, cfg: SwinConfig, prefix: str = "swin_transf.") -> Dict:
    """Swin params from a reference state_dict
    (module attributes at models/swin_transformer_mod.py:744-781)."""

    def g(name):
        return prefix + name

    # Conv2d (O, C, kh, kw) -> (kh, kw, C, O) -> (kh*kw*C, O): (u, v, c) patch order
    conv_w = _np(sd[g("patch_embed.proj.weight")])
    o, c, kh, kw = conv_w.shape
    proj_w = conv_w.transpose(2, 3, 1, 0).reshape(kh * kw * c, o)
    params = {
        "patch_embed": {
            "proj": {"w": proj_w, "b": _np(sd[g("patch_embed.proj.bias")])},
            "norm": _ln(sd, g("patch_embed.norm")) if cfg.patch_norm else None,
        },
        "stages": [],
        "norm": _ln(sd, g("norm")),
    }
    if cfg.ape:
        params["ape"] = _np(sd[g("absolute_pos_embed")])
    for i, depth in enumerate(cfg.depths):
        blocks = []
        for j in range(depth):
            b = g(f"layers.{i}.blocks.{j}.")
            blocks.append(
                {
                    "norm1": _ln(sd, b + "norm1"),
                    "attn": {
                        "qkv": _lin(sd, b + "attn.qkv"),
                        "proj": _lin(sd, b + "attn.proj"),
                        "rel_bias": _np(sd[b + "attn.relative_position_bias_table"]),
                    },
                    "norm2": _ln(sd, b + "norm2"),
                    "mlp": {
                        "fc1": _lin(sd, b + "mlp.fc1"),
                        "fc2": _lin(sd, b + "mlp.fc2"),
                    },
                }
            )
        stage = {"blocks": blocks}
        if i < cfg.num_layers - 1:
            stage["downsample"] = {
                "norm": _ln(sd, g(f"layers.{i}.downsample.norm")),
                "reduction": {"w": _np(sd[g(f"layers.{i}.downsample.reduction.weight")]).T},
            }
        params["stages"].append(stage)
    return params


def convert_end_to_end(sd: Mapping, cfg: ModelConfig) -> Dict:
    """Full end-to-end checkpoint -> {'swin', 'captioner'} pytree.

    Accepts raw state_dicts or full training checkpoints with a 'model_state_dict'
    key (reference utils/saving_utils.py:55-71)."""
    if "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    if "model" in sd:  # Swin-official pretraining format: backbone only
        raise ValueError(
            "got a Swin-official backbone checkpoint; use convert_swin(sd['model'], "
            "cfg.swin, prefix='') and initialize the caption head separately"
        )
    sd = strip_prefixes(sd)
    return {
        "swin": convert_swin(sd, cfg.swin, prefix="swin_transf."),
        "captioner": convert_captioner(sd, cfg.captioner, prefix=""),
    }


def to_jax(params):
    """numpy pytree -> jnp pytree (device placement happens lazily on first use)."""
    import jax.numpy as jnp

    if isinstance(params, dict):
        return {k: to_jax(v) for k, v in params.items()}
    if isinstance(params, list):
        return [to_jax(v) for v in params]
    if params is None:
        return None
    return jnp.asarray(params)
