"""Pallas TPU top-k for the beam-search candidate stage.

The decode hot loop runs jax.lax.top_k over the (B*beams, vocab) step
log-probs every token (decode/beam_search._candidates — the reference's
torch.topk at models/captioning_model.py:303-320). XLA lowers small-k top-k
on TPU through a partial-sort network over the padded 10k-lane rows; for
k <= 8 an iterative max-and-mask scan (k passes of lane-reduce max + argmax
+ mask) touches the row k times with no sorting machinery, entirely in VMEM.

Tie-breaking matches lax.top_k exactly (equal values -> lowest index first),
so beam choices are bit-identical; see tests/test_pallas_ops.py. Degenerate
rows are handled by an explicit chosen-index mask: rows with fewer than k
finite entries (heavily masked vocab) still return DISTINCT ascending
indices for the -inf tail, matching lax.top_k, instead of re-picking the
first -inf position (value-masking with -inf is a no-op there). Rows whose
max is NaN return the lowest unchosen index per pick — indices are always
in-range and distinct; NaN *ordering* is implementation-defined in XLA's
top_k too, so only the index-validity contract is promised there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# keep each row block comfortably under VMEM alongside its f32 working copy
_TARGET_ELEMS = 1 << 19


def _kernel(x_ref, vals_ref, idx_ref, *, k: int, V: int):
    vals = x_ref[:].astype(jnp.float32)
    r = vals.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, V), 1)
    neg = jnp.float32(-jnp.inf)
    chosen = jnp.zeros((r, V), jnp.bool_)
    for j in range(k):
        avail = jnp.where(chosen, neg, vals)
        m = jnp.max(avail, axis=-1, keepdims=True)
        # lowest UNCHOSEN index among the maxima (lax.top_k's tie-break);
        # the chosen mask keeps -inf re-picks distinct where value-masking
        # would be a no-op
        idx = jnp.min(
            jnp.where((avail == m) & ~chosen, iota, V), axis=-1, keepdims=True
        )
        # NaN max: the value match selects nothing -> lowest unchosen index,
        # keeping indices in-range and distinct
        fallback = jnp.min(
            jnp.where(~chosen, iota, V), axis=-1, keepdims=True
        )
        idx = jnp.where(idx == V, fallback, idx)
        vals_ref[:, j] = m[:, 0].astype(vals_ref.dtype)
        idx_ref[:, j] = idx[:, 0]
        chosen = chosen | (iota == idx)


def _rows_per_block(rows: int, V: int) -> int:
    """Largest row-block size that divides `rows`, fits the VMEM target AND
    satisfies Mosaic's tiling rule (second-minor block dim divisible by 8,
    or equal to the full array dim). Returns 0 when no such block exists
    (e.g. rows = 4 * odd with a wide V) — topk() then falls back to
    lax.top_k. The missing %8 constraint crashed fresh compiles at rows not
    divisible by 32-ish (found at batch 112: rows=112 picked 28)."""
    best = 0
    for rpb in range(1, rows + 1):
        if (
            rows % rpb == 0
            and rpb * V <= _TARGET_ELEMS
            and (rpb % 8 == 0 or rpb == rows)
        ):
            best = rpb
    return best


@functools.partial(jax.jit, static_argnames=("k",))
def topk_pallas(x: jnp.ndarray, k: int):
    """x: (R, V) — returns (vals (R, k) of x.dtype, idx (R, k) int32),
    sorted descending, ties broken toward the lower index (== lax.top_k)."""
    rows, V = x.shape
    rpb = _rows_per_block(rows, V)
    if rpb == 0:
        # No row block both fits VMEM and satisfies Mosaic's %8 sublane rule
        # (e.g. rows = 4 * odd with a wide V). topk() routes such shapes to
        # lax.top_k before reaching here; a direct call gets the same result.
        return jax.lax.top_k(x, k)
    grid = (rows // rpb,)
    return pl.pallas_call(
        functools.partial(_kernel, k=k, V=V),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rpb, V), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((rpb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rpb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, k), x.dtype),
            jax.ShapeDtypeStruct((rows, k), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x)


# process-wide impl toggle, mirroring decode.cache.set_dyn_step_impl
_TOPK_IMPL = "xla"


def set_topk_impl(impl: str) -> None:
    global _TOPK_IMPL
    assert impl in ("xla", "pallas"), impl
    _TOPK_IMPL = impl


def topk(x: jnp.ndarray, k: int):
    """lax.top_k-compatible; routes wide rows through the Pallas kernel when
    the pallas impl is selected (narrow rows stay on lax — the kernel's win
    is only the vocab-wide candidate stage)."""
    if _TOPK_IMPL == "pallas" and x.ndim == 2 and x.shape[-1] >= 1024 and k <= 8:
        if _rows_per_block(*x.shape) > 0:
            return topk_pallas(x, k)
    return jax.lax.top_k(x, k)
