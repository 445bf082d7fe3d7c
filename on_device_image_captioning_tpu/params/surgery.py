"""Parameter-tree surgery: partial loads and layer-removal remapping.

Rebuilds the reference's checkpoint-manipulation paths on pytrees:
- `partially_load`: copy matching leaves from a source tree into a target tree,
  keeping target leaves where the source has none (reference
  utils/saving_utils.py:113-128 partially_load_state_dict — used for
  backbone-only / body-only warm starts);
- `remove_layer`: the param_config 1/2 ablations (reference train.py:305-342):
  drop encoder (and optionally decoder) layer 1, remap layer 2 -> slot 1, and
  slice the 3-chunk reduce_group weights down to [first, last] chunks;
- `reinit_patch_embed_3x3`: the 288px/patch-3 experiment re-initializes the
  patch-embed projection to a (3,3) kernel (reference train.py:309-312).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def flatten_with_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten_with_paths(v, prefix + (str(k),))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from flatten_with_paths(v, prefix + (str(i),))
    elif tree is not None:
        yield "/".join(prefix), tree


def partially_load(target: Any, source: Any, verbose: bool = False) -> Any:
    """Copy source leaves into target wherever paths+shapes match; leave the rest
    untouched. Returns a new tree."""
    src = dict(flatten_with_paths(source))

    def replace(path, leaf):
        s = src.get(path)
        if s is not None and tuple(np.shape(s)) == tuple(np.shape(leaf)):
            if verbose:
                print(f"Found: {path}", flush=True)
            return np.asarray(s)
        if verbose and s is None:
            print(f"Not found: {path}", flush=True)
        return leaf

    def walk(t, prefix=()):
        if isinstance(t, dict):
            return {k: walk(v, prefix + (str(k),)) for k, v in t.items()}
        if isinstance(t, list):
            return [walk(v, prefix + (str(i),)) for i, v in enumerate(t)]
        if t is None:
            return None
        return replace("/".join(prefix), t)

    return walk(target)


def _slice_reduce_group(w: np.ndarray, n_layers_before: int) -> np.ndarray:
    """reduce_group weight (d_model * N, d_model) in JAX (in, out) layout: keep the
    first and last of the N input chunks (reference train.py:319-336 does the same
    on the torch (out, in) transpose)."""
    w = np.asarray(w)
    chunk = w.shape[0] // n_layers_before
    return np.concatenate([w[:chunk], w[-chunk:]], axis=0)


def remove_layer(captioner_params: Dict, param_config: int) -> Dict:
    """param_config: 1 = drop encoder layer idx 1; 2 = drop one encoder AND one
    decoder layer. Assumes the canonical 3-layer stacks."""
    if param_config == 0:
        return captioner_params
    p = jax.tree.map(lambda x: x, captioner_params)  # shallow copy of structure
    if param_config in (1, 2):
        enc = p["encoders"]
        assert len(enc) == 3, "layer removal assumes the 3-layer reference stack"
        p["encoders"] = [enc[0], enc[2]]
        p["enc_reduce_group"] = {
            "w": _slice_reduce_group(p["enc_reduce_group"]["w"], 3),
            "b": np.asarray(p["enc_reduce_group"]["b"]),
        }
    if param_config == 2:
        dec = p["decoders"]
        assert len(dec) == 3
        p["decoders"] = [dec[0], dec[2]]
        p["dec_reduce_group"] = {
            "w": _slice_reduce_group(p["dec_reduce_group"]["w"], 3),
            "b": np.asarray(p["dec_reduce_group"]["b"]),
        }
    return p


def reinit_patch_embed_3x3(swin_params: Dict, rng, embed_dim: int = 192) -> Dict:
    """Re-initialize patch-embed projection for patch-size-3 inputs: kaiming
    uniform over a (3*3*3, embed_dim) kernel (reference train.py:309-312)."""
    fan_in = 3 * 3 * 3
    bound = np.sqrt(6.0 / fan_in)  # kaiming_uniform with a=sqrt(5) gate ~ matches
    w = jax.random.uniform(rng, (fan_in, embed_dim), jnp_dtype(), -bound, bound)
    out = jax.tree.map(lambda x: x, swin_params)
    out["patch_embed"]["proj"] = {
        "w": np.asarray(w),
        "b": np.zeros((embed_dim,), np.float32),
    }
    return out


def jnp_dtype():
    import jax.numpy as jnp

    return jnp.float32
