"""Static boolean mask builders.

The reference builds dense float 0/1 masks with in-place tail zeroing
(reference: utils/masking.py:22-47 — pads always sit at the END of a sequence,
see data/transparent_data_loader.py:63-77 `add_pad_according_to_batch`). Here the
masks are boolean, built from broadcasted iotas so they fold into XLA `select`s
instead of materialized float tensors.

NOTE: the reference's end-to-end encoder builds its pad mask with a buggy shape
`(B, sum_exp, B)` (reference models/End_ExpansionNet_v2.py:137); this rebuild uses
the correct legacy shape `(B, sum_exp, S_enc)`
(reference legacy_models/End_ExpansionNet_v2.py:88-91).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def pad_mask(
    batch: int,
    out_len: int,
    in_len: int,
    row_pads: jnp.ndarray | None = None,
    col_pads: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Boolean mask of shape (batch, out_len, in_len).

    mask[b, o, i] is True where both the row `o` and column `i` are real (non-pad)
    positions. Pads occupy the tail: row o is valid iff o < out_len - row_pads[b]
    (reference utils/masking.py:22-34 with fill_zeros semantics).
    """
    rows = lax.broadcasted_iota(jnp.int32, (batch, out_len, in_len), 1)
    cols = lax.broadcasted_iota(jnp.int32, (batch, out_len, in_len), 2)
    mask = jnp.ones((batch, out_len, in_len), dtype=jnp.bool_)
    if row_pads is not None:
        row_limit = (out_len - row_pads.astype(jnp.int32)).reshape(batch, 1, 1)
        mask = mask & (rows < row_limit)
    if col_pads is not None:
        col_limit = (in_len - col_pads.astype(jnp.int32)).reshape(batch, 1, 1)
        mask = mask & (cols < col_limit)
    return mask


def causal_pad_mask(
    batch: int, seq_len: int, num_pads: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Causal (lower-triangular) + pad mask of shape (batch, seq_len, seq_len)
    (reference utils/masking.py:37-47)."""
    rows = lax.broadcasted_iota(jnp.int32, (batch, seq_len, seq_len), 1)
    cols = lax.broadcasted_iota(jnp.int32, (batch, seq_len, seq_len), 2)
    mask = cols <= rows
    if num_pads is not None:
        limit = (seq_len - num_pads.astype(jnp.int32)).reshape(batch, 1, 1)
        mask = mask & (rows < limit) & (cols < limit)
    return mask


def expand_mask_rows(mask: jnp.ndarray, num_exp: int) -> jnp.ndarray:
    """(B, T, S) -> (B, T*num_exp, S): each query row expands to `num_exp` rows
    (reference models/layers.py:165-170 mod_mask_1)."""
    b, t, s = mask.shape
    return jnp.broadcast_to(mask[:, :, None, :], (b, t, num_exp, s)).reshape(
        b, t * num_exp, s
    )


def expand_mask_cols(mask: jnp.ndarray, num_exp: int) -> jnp.ndarray:
    """(B, T, S) -> (B, T, S*num_exp): each key column expands to `num_exp` columns
    (reference models/layers.py:183-188 mod_mask_2)."""
    b, t, s = mask.shape
    return jnp.broadcast_to(mask[:, :, :, None], (b, t, s, num_exp)).reshape(
        b, t, s * num_exp
    )
