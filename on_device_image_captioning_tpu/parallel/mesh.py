"""Device mesh construction and sharding rules.

The reference's only parallelism is single-node data parallelism: one process per
GPU, DDP gradient all-reduce, and rank-sharded batching in the dataloader
(reference train.py:357-450, data/coco_dataloader.py:139-163). The TPU-native
equivalent is SPMD over a (data, model) mesh:

- the `data` axis shards the batch; gradient all-reduce becomes the psum XLA
  inserts automatically for replicated params under jit — no NCCL/DDP machinery;
- the optional `model` axis tensor-shards the widest weights (FFN hidden, vocab
  projection, QKV heads) Megatron-style, so activations of those layers ride ICI
  collectives. The reference has no TP; this is a capability extension that
  defaults to size 1.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


# path-regex -> PartitionSpec for the model axis (matched against the joined
# pytree key path, e.g. "captioner/decoders/0/ff/linear_1/w")
_MODEL_AXIS_RULES = [
    (r"ff/linear_1/w$", P(None, "model")),
    (r"ff/linear_1/b$", P("model")),
    (r"ff/linear_2/w$", P("model", None)),
    (r"mlp/fc1/w$", P(None, "model")),
    (r"mlp/fc1/b$", P("model")),
    (r"mlp/fc2/w$", P("model", None)),
    (r"attn/qkv/w$", P(None, "model")),
    (r"attn/qkv/b$", P("model")),
    (r"attn/proj/w$", P("model", None)),
    (r"vocab_linear/w$", P(None, "model")),
    (r"vocab_linear/b$", P("model")),
    (r"out_embedder/embed$", P("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_specs(params):
    """PartitionSpec pytree for a parameter pytree: TP rules above, everything
    else replicated."""

    def spec_for(path, leaf):
        if leaf is None:
            return None
        s = _path_str(path)
        for pat, spec in _MODEL_AXIS_RULES:
            if re.search(pat, s):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh according to param_specs."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
    )


def batch_spec(ndim: int) -> P:
    """Shard the leading batch dim on 'data'."""
    return P("data", *([None] * (ndim - 1)))


def shard_batch(batch, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_spec(x.ndim))), batch
    )
