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

import math
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


def make_default_mesh(batch_size: int, n_model: int = 1, devices=None) -> Mesh:
    """Largest (data, model) mesh whose 'data' axis evenly divides batch_size.

    The CLIs call this at startup so an 8-chip host trains/evaluates over all 8
    chips by default (the reference spawns one DDP process per visible GPU —
    reference train.py:616-643); a batch that doesn't divide evenly simply uses
    fewer chips rather than erroring.
    """
    devices = devices if devices is not None else jax.devices()
    avail = max(len(devices) // max(n_model, 1), 1)
    n_data = math.gcd(max(batch_size, 1), avail)
    return make_mesh(n_data=n_data, n_model=n_model, devices=devices)


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


def _put(x, sharding: NamedSharding):
    """Place one (process-replicated) array on a possibly multi-process mesh.

    Single process: plain device_put. Multi process: every process holds the
    identical full array (params/opt-state are built from the same seed or the
    same checkpoint on every host), so assemble the global array from the
    process-local copy."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), x.shape
        )
    return jax.device_put(x, sharding)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh according to param_specs."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: _put(x, NamedSharding(mesh, s)),
        params,
        specs,
    )


def batch_spec(ndim: int) -> P:
    """Shard the leading batch dim on 'data'."""
    return P("data", *([None] * (ndim - 1)))


def shard_batch(batch, mesh: Mesh):
    """Shard each array's leading (batch) dim on 'data'.

    Single process: a plain device_put. Multi process (jax.distributed): each
    process holds its own rank-shard of the global batch (the loader's seeded
    column pick — reference data/coco_dataloader.py:139-163), so assemble the
    global array from per-process local data.
    """
    multiproc = jax.process_count() > 1

    def put(x):
        sharding = NamedSharding(mesh, batch_spec(x.ndim))
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def local_rows(arr) -> np.ndarray:
    """This process's rows of a batch-dim-sharded global array (single
    process: the whole array). Used to bring per-row device results (e.g.
    SCST samples) to the host for rank-local work without touching other
    processes' shards."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    by_start = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        by_start.setdefault(start, np.asarray(s.data))
    return np.concatenate(
        [by_start[k] for k in sorted(by_start)], axis=0
    )


def host_copy(tree):
    """np copies of a (possibly multi-process sharded) pytree — safe input for
    checkpoint saving. Single process: returned unchanged (the checkpoint
    writer np-converts lazily); multi process: allgather so every process
    holds the full value."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda a: np.asarray(multihost_utils.process_allgather(a, tiled=True)),
        tree,
    )


def shard_train_state(state, mesh: Mesh):
    """Place a full train state (params + optimizer state + counters) on the mesh.

    Optimizer-state subtrees that mirror the parameter pytree (RAdam/Adam first
    and second moments, MultiSteps gradient accumulators) get the parameters'
    PartitionSpecs so TP-sharded weights keep TP-sharded moments; every other
    leaf (step counters, scalars) is replicated. This is what DDP got implicitly
    by constructing the optimizer per-rank (reference train.py:449-528).
    """
    params = state.params
    p_treedef = jax.tree.structure(params)
    p_specs = param_specs(params)

    def params_like(node) -> bool:
        try:
            return jax.tree.structure(node) == p_treedef
        except Exception:
            return False

    def put(node):
        if params_like(node):
            return jax.tree.map(
                lambda x, s: _put(x, NamedSharding(mesh, s)),
                node,
                p_specs,
            )
        return _put(node, NamedSharding(mesh, P()))

    return jax.tree.map(put, state, is_leaf=params_like)
