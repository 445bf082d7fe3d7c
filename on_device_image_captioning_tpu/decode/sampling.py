"""Multinomial sampling decode (SCST's sample generator) as a lax.while_loop.

Replicates reference `get_batch_multiple_sampled_prediction`
(reference models/captioning_model.py:120-218): each image is expanded to
`num_outputs` rows, one token is sampled per step from the softmax until EOS or
max_seq_len, per-step logprobs are recorded and zeroed after the first EOS
(reference :206-215). The incremental DecState replaces the reference's
full-prefix re-decode per step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CaptionerConfig
from . import cache as dc


class SampleResult(NamedTuple):
    tokens: jnp.ndarray  # (B, num_outputs, L+1) int32, starts with SOS
    logprobs: jnp.ndarray  # (B, num_outputs, L+1) f32, 0 after first EOS
    lengths: jnp.ndarray  # (B, num_outputs) int32 = index of first EOS (or L)


def sample(
    params,
    cfg: CaptionerConfig,
    enc_output: jnp.ndarray,
    num_outputs: int,
    max_seq_len: int,
    rng: jax.Array,
    sos_idx: int,
    eos_idx: int,
    dtype=None,
    enc_num_pads=None,
    chunks=None,
) -> SampleResult:
    """enc_output: (B, S_enc, d_model). Jittable, static shapes.

    enc_num_pads: (B,) trailing pad-row counts for padded feature batches.
    chunks: optional increasing cache-length schedule ending at max_seq_len
    (chunked decode, same semantics as beam_loop's: the per-step dyn-step
    kernels are bandwidth-bound on the vals caches, so early steps run on
    short caches; positions beyond `pos` are masked, so results match the
    single-phase form). Defaults to beam_search.default_chunk_schedule."""
    from .beam_search import _grow_caches, default_chunk_schedule

    b = enc_output.shape[0]
    n = b * num_outputs
    L = max_seq_len
    if chunks is None:
        chunks = default_chunk_schedule(L)
    assert chunks[-1] == L and tuple(chunks) == tuple(sorted(set(chunks))), (
        f"chunk schedule {chunks} must increase to max_seq_len={L}"
    )

    # the per-sample expansion of the encoder side stays VIRTUAL: K/V and the
    # enc mask keep one row per image, shared across each image's num_outputs
    # sample rows via dec_step's `group` (reference :129-134 materializes the
    # repeat; here only the mutable caches have n rows)
    state = dc.init_state(
        params, cfg, enc_output, chunks[0] + 1,
        dtype if dtype is not None else jnp.float32, enc_num_pads=enc_num_pads,
    )
    muts, static = dc.split_state(state)
    rep = jnp.repeat(jnp.arange(b, dtype=jnp.int32), num_outputs)
    muts = jax.tree.map(lambda a: jnp.take(a, rep, axis=0), muts)

    class Carry(NamedTuple):
        t: jnp.ndarray  # next position to sample (0-based step counter)
        tokens: jnp.ndarray  # (N, L+1)
        logprobs: jnp.ndarray  # (N, L+1)
        where_eos: jnp.ndarray  # (N,) first-EOS step (init L, reference :136-139)
        finished: jnp.ndarray  # (N,)
        muts: object
        rng: jax.Array

    tokens = jnp.zeros((n, L + 1), jnp.int32).at[:, 0].set(sos_idx)

    def body(c: Carry):
        t = c.t
        last = jax.lax.dynamic_index_in_dim(c.tokens, t, axis=1, keepdims=False)
        # no beam reshuffle here, so the Pallas step donates the cache inputs
        # themselves and updates them in place — the carry keeps one buffer
        # set and XLA inserts no per-step cache copies
        logp, new_state = dc.dec_step(
            params, cfg, dc.merge_state(c.muts, static), last, t, dtype,
            group=num_outputs, in_place=True,
        )
        muts = dc.split_state(new_state)[0]
        rng, sub = jax.random.split(c.rng)
        word = jax.random.categorical(sub, logp, axis=-1).astype(jnp.int32)
        word_lp = jnp.take_along_axis(logp, word[:, None], axis=-1)[:, 0]
        tokens = jax.lax.dynamic_update_index_in_dim(c.tokens, word, t + 1, axis=1)
        logprobs = jax.lax.dynamic_update_index_in_dim(
            c.logprobs, word_lp, t + 1, axis=1
        )
        is_eos = word == eos_idx
        where_eos = jnp.minimum(
            c.where_eos, jnp.where(is_eos, t + 1, L)
        )  # reference :183-188
        finished = c.finished | is_eos
        return Carry(t + 1, tokens, logprobs, where_eos, finished, muts, rng)

    out = Carry(
        jnp.int32(0),
        tokens,
        jnp.zeros((n, L + 1), jnp.float32),
        jnp.full((n,), L, jnp.int32),
        jnp.zeros((n,), jnp.bool_),
        muts,
        rng,
    )
    # one while_loop per chunk; only the CACHES grow between phases (the
    # token/logprob buffers are full-length throughout). Later phases run
    # zero iterations once every row has sampled EOS.
    for ci, chunk in enumerate(chunks):
        if ci:
            out = out._replace(muts=_grow_caches(out.muts, chunk + 1))

        def cond(c: Carry, _chunk=chunk):
            return (c.t < _chunk) & ~jnp.all(c.finished)

        out = jax.lax.while_loop(cond, body, out)

    # zero logprobs after the first EOS (reference :206-215)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, L + 1), 1)
    logprobs = jnp.where(pos > out.where_eos[:, None], 0.0, out.logprobs)

    return SampleResult(
        tokens=out.tokens.reshape(b, num_outputs, L + 1),
        logprobs=logprobs.reshape(b, num_outputs, L + 1),
        lengths=out.where_eos.reshape(b, num_outputs),
    )


def captions_from_result(res: SampleResult):
    """Host-side: lists truncated at first EOS inclusive (reference :194-204)."""
    tokens = jax.device_get(res.tokens)
    lengths = jax.device_get(res.lengths)
    b, n, _ = tokens.shape
    return [
        [tokens[i, j, : lengths[i, j] + 1].tolist() for j in range(n)]
        for i in range(b)
    ]
