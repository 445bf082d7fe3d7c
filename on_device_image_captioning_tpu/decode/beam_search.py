"""Batched beam search as a fixed-shape lax.while_loop over the incremental decoder.

Semantics replicate the reference loop exactly (reference
models/captioning_model.py:220-427):

- step 1 seeds beams from the SOS logits (top-k sorted, or multinomial without
  replacement in 'sample' mode);
- each step proposes beam_size candidates per beam; beams whose prefix already
  contains EOS are frozen by zeroing candidate 0 and -999'ing the rest
  (reference :322-335) so the finished hypothesis stays comparable;
- the beam pool is re-ranked by cumulative logprob over beam_size^2 candidates
  (reference :337-344);
- sequence length bookkeeping (`num_elem`) counts tokens up to and including the
  first EOS (reference :383-395), and the loop exits early when no beam grew in
  the previous iteration (reference :397-398);
- final ranking divides cumulative logprob by length (reference :401).

The TPU-native difference is purely mechanical: one token per step through the
exact incremental DecState (decode/cache.py) instead of re-running the full
decoder over the prefix, with beam reshuffles applied to the caches via gather.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CaptionerConfig, DecodeConfig
from . import cache as dc


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # (B, how_many_outputs, L) int32 (garbage after length)
    logprobs: jnp.ndarray  # (B, how_many_outputs, L) f32 per-step logprobs
    lengths: jnp.ndarray  # (B, how_many_outputs) int32 incl. SOS and EOS


def default_chunk_schedule(max_seq_len: int, first: int = 12):
    """Cache-length schedule for chunked decode: single phase for very short
    budgets, a (12, L) two-phase for short ones (the TRT-style 20-step decode
    measures 15.5 -> 13.5 ms at b32/beam3 from running steps 2..12 on 12-slot
    caches — the per-step Pallas dyn-step kernels are bandwidth-bound on the
    vals caches, so traffic scales with CURRENT cache length), else a dense
    ramp: 12, 24, then +16 per phase. The round-4 sweep at the eval budget
    (L=74, b32/beam3) measured the dense ramp (12,24,40,56,74) at 111.7 ms
    no-EOS / 118.3 ms typical-EOS vs the former doubled (24,48,74)'s
    116.9 / 125.2 — per-step cache traffic tracks the CURRENT chunk length,
    so more, smaller phases win until per-phase compile/launch overhead
    bites (each phase compiles its own decoder-step kernels). All non-final
    chunks are even — required for the double-buffered loop body's phase
    handoff (see beam_loop). A chunk within 8 steps of max_seq_len merges
    into the final phase (a near-degenerate final phase like 96 -> 100
    would pay a whole compile for a few steps that position-masking makes
    free to fold into the previous one)."""
    first = first + (first % 2)  # non-final chunks must be even (see below)
    if max_seq_len <= first + 4:
        return (max_seq_len,)
    if max_seq_len <= first + 8:
        return (first, max_seq_len)
    chunks = []
    c = first
    while c + 8 < max_seq_len:
        chunks.append(c + (c % 2))
        c = 2 * c if c < 24 else c + 16
    chunks.append(max_seq_len)
    return tuple(chunks)


def _grow_caches(state, new_len: int):
    """Zero-pad every cache leaf's position axis (axis 1) up to new_len.
    Decode masks positions > pos, so the padding is never read as data — it
    only raises the step budget of the next phase. (Numerics agree with a
    full-length phase up to fp32 reduction order: contractions span the
    cache length, so XLA groups the same nonzero terms differently.)"""

    def pad(a):
        cur = a.shape[1]
        if cur >= new_len:
            return a
        widths = [(0, 0)] * a.ndim
        widths[1] = (0, new_len - cur)
        return jnp.pad(a, widths)

    return jax.tree.map(pad, state)


def _candidates(log_probs, k, sample, rng):
    """Top-k candidates per row, or sample-without-replacement via Gumbel top-k
    (exact equivalent of torch.multinomial(replacement=False) over exp(logp)).
    The vocab-wide top-k routes through the Pallas iterative-max kernel when
    enabled (ops/topk.py; tie-breaks identical to lax.top_k)."""
    from ..ops.topk import topk

    if not sample:
        vals, idx = topk(log_probs, k)
        return vals, idx
    g = jax.random.gumbel(rng, log_probs.shape, dtype=log_probs.dtype)
    _, idx = topk(log_probs + g, k)
    vals = jnp.take_along_axis(log_probs, idx, axis=-1)
    return vals, idx


def beam_search(
    params,
    cfg: CaptionerConfig,
    enc_output: jnp.ndarray,
    decode_cfg: DecodeConfig,
    rng: Optional[jax.Array] = None,
    dtype=None,
    enc_num_pads: Optional[jnp.ndarray] = None,
    double_buffer: Optional[bool] = None,
) -> BeamResult:
    """Single-model beam search. enc_output: (B, S_enc, d_model). Jittable.

    When `dtype` selects bf16 compute, the decoder caches are stored bf16 too
    (halves decode HBM traffic; see decode/cache.py).

    enc_num_pads: (B,) trailing pad-row counts for heterogeneous feature batches
    (the reference expands enc masks beam-wise at
    models/captioning_model.py:239-281)."""
    cache_dtype = dtype if dtype is not None else jnp.float32
    chunks = decode_cfg.chunk_schedule or default_chunk_schedule(
        decode_cfg.max_seq_len
    )
    state = dc.init_state(
        params, cfg, enc_output, chunks[0], cache_dtype,
        enc_num_pads=enc_num_pads,
    )
    b = enc_output.shape[0]
    muts, static = dc.split_state(state)

    # the loop-invariant cross K/V and enc mask stay OUT of the while carry
    # and UNEXPANDED (one row per image, shared across its beams via `group`
    # — see dc.MutCaches); only the mutable caches get beam-expanded rows
    def step_fn(muts, tokens, pos, reorder=None, group=1, dst=None):
        st = dc.merge_state(muts, static)
        logp, new_state = dc.dec_step(
            params, cfg, st, tokens, pos, dtype, reorder=reorder, group=group,
            prev=dst,
        )
        return logp, dc.split_state(new_state)[0]

    return beam_loop(
        step_fn, muts, b, decode_cfg, rng, double_buffer=double_buffer,
        chunks=chunks,
    )


def ensemble_beam_search(
    params_list,
    cfg: CaptionerConfig,
    enc_outputs,
    decode_cfg: DecodeConfig,
    rng: Optional[jax.Array] = None,
    dtype=None,
    enc_num_pads: Optional[jnp.ndarray] = None,
) -> BeamResult:
    """Ensemble decode: per-model decoder states; the step log-probs are
    log(mean_i softmax(logits_i)) (reference
    models/ensemble_captioning_model.py:55-84). `enc_outputs` is one encoder
    output per model (each model encodes with its own weights, reference :48-53).
    """
    cache_dtype = dtype if dtype is not None else jnp.float32
    chunks = decode_cfg.chunk_schedule or default_chunk_schedule(
        decode_cfg.max_seq_len
    )
    b = enc_outputs[0].shape[0]
    split = [
        dc.split_state(
            dc.init_state(p, cfg, e, chunks[0], cache_dtype,
                          enc_num_pads=enc_num_pads)
        )
        for p, e in zip(params_list, enc_outputs)
    ]
    muts_list = [m for m, _ in split]
    statics = [s for _, s in split]

    def step_fn(muts_list, tokens, pos, reorder=None, group=1, dst=None):
        logps, new_list = [], []
        for i, (p, m, st) in enumerate(zip(params_list, muts_list, statics)):
            lp, ns = dc.dec_step(
                p, cfg, dc.merge_state(m, st), tokens, pos, dtype,
                reorder=reorder, group=group,
                prev=None if dst is None else dst[i],
            )
            logps.append(lp)
            new_list.append(dc.split_state(ns)[0])
        avg = jnp.log(
            jnp.mean(jnp.exp(jnp.stack(logps, axis=0)), axis=0)
        )
        return avg, new_list

    return beam_loop(step_fn, muts_list, b, decode_cfg, rng, chunks=chunks)


def _gather_rows(state, indices: jnp.ndarray):
    """Reorder the leading batch axis of every array leaf (used once to expand
    the per-image state to per-beam rows)."""
    return jax.tree.map(lambda a: jnp.take(a, indices, axis=0), state)


def beam_loop(
    step_fn,
    state,
    b: int,
    decode_cfg: DecodeConfig,
    rng: Optional[jax.Array] = None,
    double_buffer: Optional[bool] = None,
    chunks: Optional[Tuple[int, ...]] = None,
) -> BeamResult:
    """Core fixed-shape beam loop over an opaque MUTABLE decoder-cache pytree
    whose array leaves all have the flattened (batch*beam) leading axis.

    step_fn(muts, tokens, pos, reorder, group, dst) closes over the
    loop-invariant decode inputs (cross K/V, enc mask, params) so the while
    carry holds only what changes per step; the invariants stay at one row
    per image, shared across the image's `group` beam rows inside the step.

    The loop body runs TWO decode steps and ping-pongs two cache buffer sets
    A/B with FIXED roles: step 1 reads A and writes (donated, in-place) into
    B, step 2 reads B and writes into A, so each carry position keeps one
    buffer across iterations and XLA inserts no cache copies. (One step per
    iteration forces a copy of every cache per step — the carry position's
    allocation is fixed but the un-donated kernel output is fresh; donating
    with the two sets SWAPPING positions per iteration is worse still, both
    sets get copied. Measured at b32/beam3/L20 on v5e: 26.1 ms single-step
    un-donated, 47.8 ms donated+swapped, 18.2 ms this form.)
    Step 2's bookkeeping is predicated on the loop condition still holding
    after step 1; its cache-side compute runs unconditionally, which is
    harmless: when the condition has failed, the loop exits right after
    (the bookkeeping that feeds the condition is kept at step 1's values),
    and the final result depends only on the bookkeeping.

    double_buffer defaults to whether the Pallas dyn-step impl is active —
    the XLA impl ignores the donated buffers, so carrying the spare set
    would just double decode-cache HBM residency; it gets a plain
    one-step-per-iteration body instead.

    chunks: optional increasing cache-length schedule ending at max_seq_len
    (chunked decode). `state` must be allocated at chunks[0] positions; the
    loop runs one while_loop per chunk and zero-pads the caches' position
    axis between phases, so per-step cache traffic scales with the CURRENT
    chunk, and later (bigger) phases run zero iterations once every beam has
    stopped growing. Token-identical to a single phase at max_seq_len:
    positions > pos are masked, and phase boundaries only pause/resume the
    loop. Non-final chunks must be EVEN under double_buffer: the 2-step body
    leaves a consistent carry (pending reorder not yet applied to the live
    cache set) only when the inner condition still held after step 1, which
    at a phase boundary t == chunk reduces to t being even (t starts at 2
    and advances by 2, so the inner check t+1 < chunk holds iff chunk is
    even; an odd boundary would hand phase p+1 a cache set that already
    applied the pending reorder, double-applying it on resume)."""
    k = decode_cfg.beam_size
    L = decode_cfg.max_seq_len
    sample = decode_cfg.sample_or_max == "sample"
    sos, eos = decode_cfg.sos_idx, decode_cfg.eos_idx
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # ---- step 1: expand SOS into beam_size beams (reference :241-271) ----
    sos_tok = jnp.full((b,), sos, jnp.int32)
    logp0, state = step_fn(state, sos_tok, jnp.int32(0), None, 1)
    rng, sub = jax.random.split(rng)
    first_vals, first_idx = _candidates(logp0, k, sample, sub)  # (B, K)

    tokens = jnp.zeros((b, k, L), jnp.int32).at[:, :, 0].set(sos)
    tokens = tokens.at[:, :, 1].set(first_idx)
    logprobs = jnp.zeros((b, k, L), jnp.float32).at[:, :, 1].set(first_vals)
    cumul = first_vals  # (B, K)
    num_elem = jnp.full((b, k), 2, jnp.int32)
    finished = jnp.zeros((b, k), jnp.bool_)

    # replicate the mutable caches per beam: flattened (batch, beam) row order
    beam_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    state = _gather_rows(state, beam_idx)

    if double_buffer is None:
        double_buffer = dc._DYN_STEP_IMPL != "xla"
    spare = jax.tree.map(jnp.zeros_like, state) if double_buffer else ()

    class Carry(NamedTuple):
        t: jnp.ndarray
        tokens: jnp.ndarray
        logprobs: jnp.ndarray
        cumul: jnp.ndarray
        num_elem: jnp.ndarray
        finished: jnp.ndarray
        state: object  # caches in buffer set A (B even iterations)
        spare: object  # the other (dead) cache buffer set
        reorder: jnp.ndarray  # (B*K,) pending beam reshuffle, fused into step
        rng: jax.Array

    def make_cond(t_limit):
        def cond(c: Carry):
            # continue while some beam grew last iteration (reference :397-398)
            return (c.t < t_limit) & jnp.any(c.num_elem == c.t)

        return cond

    def substep(c: Carry, dst):
        """One decode step + bookkeeping: returns the t+1 Carry (spare is
        left untouched — the caller manages the A/B ping-pong)."""
        t = c.t
        last = jax.lax.dynamic_index_in_dim(c.tokens, t - 1, axis=2, keepdims=False)
        # the previous iteration's reshuffle is applied INSIDE the step (the
        # Pallas decode kernel gathers cache rows through its index maps; the
        # XLA path does the identical jnp.take) — no separate gather pass
        logp, state = step_fn(
            c.state, last.reshape(b * k), t - 1, c.reorder, k, dst
        )  # (B*K, V)
        rng, sub = jax.random.split(c.rng)
        cand_vals, cand_idx = _candidates(logp, k, sample, sub)
        cand_vals = cand_vals.reshape(b, k, k)
        cand_idx = cand_idx.reshape(b, k, k)

        # freeze finished beams (reference :322-335)
        frozen = c.finished[:, :, None]
        cand_vals = jnp.concatenate(
            [
                jnp.where(frozen, 0.0, cand_vals[:, :, :1]),
                jnp.where(frozen, -999.0, cand_vals[:, :, 1:]),
            ],
            axis=-1,
        )

        comparison = (c.cumul[:, :, None] + cand_vals).reshape(b, k * k)
        top_vals, topi = jax.lax.top_k(comparison, k)  # sorted (reference :342)
        which_seq = topi // k  # (B, K)
        which_word = topi % k

        def g2(x):  # gather (B, K, ...) along beam dim
            return jnp.take_along_axis(
                x, which_seq.reshape(b, k, *([1] * (x.ndim - 2))), axis=1
            )

        new_tokens = g2(c.tokens)
        new_logprobs = g2(c.logprobs)
        sel_word = jnp.take_along_axis(
            g2(cand_idx), which_word[:, :, None], axis=2
        )[:, :, 0]
        sel_val = jnp.take_along_axis(
            g2(cand_vals), which_word[:, :, None], axis=2
        )[:, :, 0]
        new_tokens = jax.lax.dynamic_update_index_in_dim(
            new_tokens, sel_word, t, axis=2
        )
        new_logprobs = jax.lax.dynamic_update_index_in_dim(
            new_logprobs, sel_val, t, axis=2
        )

        was_finished = jnp.take_along_axis(c.finished, which_seq, axis=1)
        new_num_elem = jnp.take_along_axis(c.num_elem, which_seq, axis=1) + (
            1 - was_finished.astype(jnp.int32)
        )
        new_finished = was_finished | (sel_word == eos)
        new_cumul = top_vals

        flat_gather = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * k + which_seq
        ).reshape(b * k)

        return Carry(
            t + 1, new_tokens, new_logprobs, new_cumul, new_num_elem, new_finished,
            state, c.spare, flat_gather, rng,
        )

    def make_body(cond):
        def body(c: Carry):
            if not double_buffer:
                # XLA dyn-step impl ignores donated buffers: plain one-step body
                return substep(c, None)
            # step 1: reads buffer set A (c.state), writes in place into the
            # dead set B (c.spare)
            c1 = substep(c, c.spare)
            # step 2: reads B, writes back into A (dead once step 1 has run);
            # bookkeeping keeps step 1's values if the loop should have stopped
            c2 = substep(c1, c.state)
            ok = cond(c1)
            book = jax.tree.map(
                lambda x2_, x1_: jnp.where(ok, x2_, x1_),
                (c2.t, c2.tokens, c2.logprobs, c2.cumul, c2.num_elem,
                 c2.finished, c2.reorder, c2.rng),
                (c1.t, c1.tokens, c1.logprobs, c1.cumul, c1.num_elem,
                 c1.finished, c1.reorder, c1.rng),
            )
            (t_, tokens_, logprobs_, cumul_, num_elem_, finished_, reorder_,
             rng_) = book
            return Carry(
                t_, tokens_, logprobs_, cumul_, num_elem_, finished_,
                c2.state, c1.state, reorder_, rng_,
            )

        return body

    if chunks is None:
        chunks = (L,)
    assert chunks[-1] == L and tuple(chunks) == tuple(sorted(set(chunks))), (
        f"chunk schedule {chunks} must increase to max_seq_len={L}"
    )
    if double_buffer:
        assert all(c % 2 == 0 for c in chunks[:-1]), (
            f"non-final chunks must be even under double_buffer: {chunks}"
        )
    out = Carry(
        jnp.int32(2), tokens, logprobs, cumul, num_elem, finished, state, spare,
        jnp.arange(b * k, dtype=jnp.int32), rng,
    )
    for i, chunk in enumerate(chunks):
        if i:
            grown = _grow_caches(out.state, chunk)
            out = out._replace(
                state=grown,
                spare=jax.tree.map(jnp.zeros_like, grown) if double_buffer
                else (),
            )
        cond = make_cond(chunk)
        out = jax.lax.while_loop(cond, make_body(cond), out)

    # ---- final ranking: length-normalized cumulative logprob (reference :400-417)
    norm = out.cumul / out.num_elem.astype(jnp.float32)
    _, order = jax.lax.top_k(norm, k)  # (B, K) sorted
    order = order[:, : decode_cfg.how_many_outputs]

    def g(x):
        return jnp.take_along_axis(
            x, order.reshape(b, -1, *([1] * (x.ndim - 2))), axis=1
        )

    return BeamResult(
        tokens=g(out.tokens),
        logprobs=g(out.logprobs),
        lengths=jnp.take_along_axis(out.num_elem, order, axis=1),
    )


def _to_host(a):
    """device->host that also works for multi-process sharded results: gather
    the global array so every process sees all rows (jax.device_get alone
    raises on arrays spanning non-addressable devices)."""
    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return jax.device_get(a)


def captions_from_result(res: BeamResult) -> Tuple[list, list]:
    """Host-side: truncate fixed buffers to per-caption length, mirroring the
    reference's list-of-lists return (reference models/captioning_model.py:403-427)."""
    tokens = _to_host(res.tokens)
    logprobs = _to_host(res.logprobs)
    lengths = _to_host(res.lengths)
    b, n, _ = tokens.shape
    caps = [
        [tokens[i, j, : lengths[i, j]].tolist() for j in range(n)] for i in range(b)
    ]
    lps = [
        [logprobs[i, j, : lengths[i, j]].tolist() for j in range(n)] for i in range(b)
    ]
    return caps, lps
