"""Int8 quantization of model parameters, TPU-native.

Capability parity with the reference's FX int8 quantization of the split
encoder/decoder (reference quantization.py:34-284, utils/quantization_utils.py:17-100
— static with calibration, dynamic, QAT flag), re-designed for TPU:

- weights are quantized per-output-channel symmetric int8 (scale = absmax/127);
- 'w8'      : weight-only — weights dequantize on the fly into the bf16/fp32
              matmul (HBM-bandwidth win; the usual TPU serving mode);
- 'w8a8'    : dynamic activation quantization — per-tensor absmax at runtime,
              int8 x int8 MXU matmul with int32 accumulation (the dynamic-FX
              equivalent);
- 'w8a8_static': activation scales frozen from calibration batches (the
              static-FX equivalent; see `calibrate`);
- QAT: `fake_quant` is differentiable with a straight-through estimator, usable
  inside the training loss for quantization-aware fine-tuning.

Quantized linears are ordinary pytree nodes ({'w_q', 'scale', ['b'], ['x_scale']})
and models/common.linear dispatches on them, so every model/decode/train path runs
quantized without code changes — including the incremental beam search.
"""
from __future__ import annotations

import re
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# subtree predicates matching the reference's encoder/decoder module-name filters
# (reference quantization.py:34-67)
ENCODER_PAT = re.compile(r"(^|/)(encoders|input_linear|enc_reduce_group|swin)(/|$)")
DECODER_PAT = re.compile(
    r"(^|/)(decoders|vocab_linear|dec_reduce_group|out_embedder|pos_encoder)(/|$)"
)


def quantize_linear(p: dict, mode: str = "w8") -> dict:
    """{'w': (in,out) f32, 'b'} -> quantized node."""
    w = np.asarray(p["w"], np.float32)
    scale = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0  # per out channel
    w_q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    out = {"w_q": w_q, "scale": scale.astype(np.float32)}
    if mode.startswith("w8a8"):
        # structural marker (empty dict = pytree structure, no leaves): keeps the
        # node jit-compatible where a string leaf would not be
        out["a8"] = {}
    if "b" in p:
        out["b"] = np.asarray(p["b"])
    return out


def quantized_matmul(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Dispatch target for models/common.linear on quantized nodes."""
    if "a8" not in p:  # weight-only
        w = p["w_q"].astype(jnp.bfloat16) * p["scale"].astype(jnp.bfloat16)
        y = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    else:
        if "x_scale" in p:  # static (calibrated)
            x_scale = p["x_scale"]
        else:  # dynamic per-tensor
            x_scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
        x_q = jnp.clip(jnp.rint(x / x_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q, p["w_q"],
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (x_scale * p["scale"])
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def is_quantized(p) -> bool:
    return isinstance(p, dict) and "w_q" in p


def quantize_tree(
    params: Any,
    mode: str = "w8",
    path_filter: Optional[Callable[[str], bool]] = None,
) -> Any:
    """Replace every linear node ({'w': 2D, ...}) whose path passes the filter.
    Embeddings/LayerNorms stay fp32 (the reference's FX config likewise only hits
    nn.Linear)."""

    def walk(t, prefix=""):
        if isinstance(t, dict):
            if "w" in t and getattr(np.asarray(t["w"]), "ndim", 0) == 2 and (
                path_filter is None or path_filter(prefix)
            ):
                return quantize_linear(t, mode)
            return {k: walk(v, f"{prefix}/{k}" if prefix else str(k)) for k, v in t.items()}
        if isinstance(t, list):
            return [walk(v, f"{prefix}/{i}") for i, v in enumerate(t)]
        return t

    return walk(params)


def dequantize_tree(params: Any) -> Any:
    """Expand weight-only (w8) nodes back to dense bf16 {'w', 'b'} nodes;
    w8a8 nodes stay quantized (they run int8 MXU matmuls).

    Call this INSIDE a jitted decode function, before the decode loop: the
    dequant then traces once per call instead of once per decode STEP per
    consumer — the difference between int8 footprint being free and the
    round-1 w8 throughput regression. HBM keeps the int8 checkpoint; only the
    transient per-call bf16 view exists on device.
    """
    import jax.numpy as jnp

    def walk(t):
        if isinstance(t, dict):
            if "w_q" in t and "a8" not in t:
                out = {
                    "w": t["w_q"].astype(jnp.bfloat16)
                    * t["scale"].astype(jnp.bfloat16)
                }
                if "b" in t:
                    out["b"] = t["b"]
                return out
            return {k: walk(v) for k, v in t.items()}
        if isinstance(t, list):
            return [walk(v) for v in t]
        return t

    return walk(params)


def quantize_encoder(params, mode="w8"):
    """Quantize only the encoder half (reference split_encoder quantization)."""
    return quantize_tree(params, mode, lambda p: bool(ENCODER_PAT.search(p)))


def quantize_decoder(params, mode="w8"):
    return quantize_tree(params, mode, lambda p: bool(DECODER_PAT.search(p)))


def calibrate(params_q: Any, collect: List) -> Any:
    """Static activation calibration: freeze per-layer activation scales from
    recorded (path, absmax) pairs gathered over calibration batches (the
    reference's prepare_fx/convert_fx calibration pass, quantization.py:150-230).
    Collect the pairs by running the fp32 model on calibration data and recording
    the absmax of each quantized linear's input at the listed paths."""
    scales = {}
    for path, amax in collect:
        scales[path] = max(scales.get(path, 0.0), float(amax))

    def walk(t, prefix=""):
        if isinstance(t, dict):
            if "w_q" in t:
                out = dict(t)
                if prefix in scales:
                    out["x_scale"] = np.float32(max(scales[prefix], 1e-8) / 127.0)
                    out["a8"] = {}
                return out
            return {k: walk(v, f"{prefix}/{k}" if prefix else str(k)) for k, v in t.items()}
        if isinstance(t, list):
            return [walk(v, f"{prefix}/{i}") for i, v in enumerate(t)]
        return t

    return walk(params_q)


def fake_quant(x: jnp.ndarray, num_bits: int = 8) -> jnp.ndarray:
    """Differentiable fake quantization (straight-through estimator) for QAT —
    the reference exposes QAT through an FX flag (utils/quantization_utils.py)."""
    qmax = 2.0 ** (num_bits - 1) - 1
    scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / qmax
    q = jnp.clip(jnp.rint(x / scale), -qmax, qmax) * scale
    return x + jax.lax.stop_gradient(q - x)


def quantized_size_bytes(params) -> int:
    """Serialized parameter footprint (int8 weights count 1 byte)."""
    total = 0
    for leaf in jax.tree.leaves(params):
        a = np.asarray(leaf)
        total += a.size * a.dtype.itemsize
    return total
