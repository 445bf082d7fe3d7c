"""Magnitude pruning: global L1 unstructured with sparse checkpoints.

Capability parity with the reference's pruning path (reference
benchmarking/benchmarking.py:123-151: torch.nn.utils.prune.global_unstructured L1
at 33% per round, repeated; sparsity report; sparse-tensor checkpoint save; and
test.py:455-459's --load_pruned path).

On TPU there is no sparse-tensor execution win for unstructured sparsity — pruned
weights run as dense zeros (exactly like the reference's pruned inference). The
win is the checkpoint: `save_sparse` stores only nonzero values + int32 indices.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List

import numpy as np


def _prunable(path: str, leaf) -> bool:
    a = np.asarray(leaf)
    return a.ndim >= 2 and path.endswith("/w")


def _walk(tree, fn, prefix=""):
    if isinstance(tree, dict):
        return {k: _walk(v, fn, f"{prefix}/{k}" if prefix else str(k)) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_walk(v, fn, f"{prefix}/{i}") for i, v in enumerate(tree)]
    if tree is None:
        return None
    return fn(prefix, tree)


def global_l1_prune(
    params: Any,
    amount: float = 0.33,
    predicate: Callable[[str, Any], bool] = _prunable,
) -> Any:
    """Zero the globally-smallest |w| entries across all prunable tensors so that
    `amount` of the already-nonzero entries are removed (applying repeatedly
    compounds, matching the reference's repeated 33% rounds)."""
    mags: List[np.ndarray] = []

    def collect(path, leaf):
        if predicate(path, leaf):
            a = np.abs(np.asarray(leaf, np.float32)).ravel()
            mags.append(a[a > 0])
        return leaf

    _walk(params, collect)
    allmags = np.concatenate(mags) if mags else np.zeros(1)
    k = int(len(allmags) * amount)
    if k == 0:
        return params
    threshold = np.partition(allmags, k - 1)[k - 1]

    def prune(path, leaf):
        if predicate(path, leaf):
            a = np.asarray(leaf)
            return np.where(np.abs(a) <= threshold, 0.0, a).astype(a.dtype)
        return leaf

    return _walk(params, prune)


def sparsity_report(params: Any) -> Dict[str, float]:
    """Per-tensor and global zero fractions (reference prints the same table)."""
    report = {}
    total, zeros = 0, 0

    def count(path, leaf):
        nonlocal total, zeros
        a = np.asarray(leaf)
        if a.ndim >= 2:
            z = int((a == 0).sum())
            report[path] = z / a.size
            total += a.size
            zeros += z
        return leaf

    _walk(params, count)
    report["GLOBAL"] = zeros / max(total, 1)
    return report


def save_sparse(path: str, params: Any) -> None:
    """Store pruned params as {path: (shape, nonzero idx, nonzero values)} npz."""
    payload = {}

    def pack(p, leaf):
        a = np.asarray(leaf)
        if a.ndim >= 2 and (a == 0).mean() > 0.25:
            idx = np.flatnonzero(a).astype(np.int32)
            payload[f"{p}::idx"] = idx
            payload[f"{p}::val"] = a.ravel()[idx]
            payload[f"{p}::shape"] = np.asarray(a.shape, np.int32)
        else:
            payload[f"{p}::dense"] = a
        return leaf

    _walk(params, pack)
    np.savez_compressed(path, **payload)


def load_sparse(path: str, template: Any) -> Any:
    """Rebuild a dense pytree from a sparse npz using the template's structure."""
    data = np.load(path)

    def unpack(p, leaf):
        if f"{p}::dense" in data:
            return data[f"{p}::dense"]
        shape = tuple(data[f"{p}::shape"])
        flat = np.zeros(int(np.prod(shape)), np.asarray(leaf).dtype)
        flat[data[f"{p}::idx"]] = data[f"{p}::val"]
        return flat.reshape(shape)

    return _walk(template, unpack)
