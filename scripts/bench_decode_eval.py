"""Eval-shape decode measurement (VERDICT r2 item 1): beam decode cost at the
evaluate CLI's operating point (b32, beam 3, max_seq_len=74 — the dataset max
the reference also budgets for, reference test.py:141-275) with and without the
chunked cache-length schedule.

Two workloads per schedule:
  no-EOS   eos_idx never produced (random weights) — every beam runs all 72
           steps; the worst case the r2 measurement (166.8 ms) recorded.
  typical  eos_idx set to a token the random model actually emits, so beams
           finish after ~10-25 steps like real checkpoints do (real
           captions EOS after ~12-20 steps) — the workload the eval CLI
           actually runs.

    python scripts/bench_decode_eval.py [batch] [iters]
"""
import collections
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # compile+warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.device_get(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from on_device_image_captioning_tpu.config import (
        DecodeConfig, end_expansionnet_v2_coco,
    )
    from on_device_image_captioning_tpu.decode import beam_search as bs
    from on_device_image_captioning_tpu.decode.cache import set_dyn_step_impl
    from on_device_image_captioning_tpu.models.captioner import captioner_init

    set_dyn_step_impl("pallas")
    cfg = end_expansionnet_v2_coco(compute_dtype=jnp.bfloat16).captioner
    # decode only exercises the caption head; feed a random encoder output
    params = captioner_init(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(1)
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 144, cfg.d_model)),
        jnp.bfloat16,
    ).astype(jnp.bfloat16)

    L = 74

    def decode_fn(schedule, eos):
        dcfg = DecodeConfig(
            beam_size=3, how_many_outputs=1, max_seq_len=L,
            sos_idx=cfg.sos_idx, eos_idx=eos, chunk_schedule=schedule,
        )

        @jax.jit
        def decode(p, e):
            res = bs.beam_search(
                p, cfg, e, dcfg, rng=rng, dtype=jnp.bfloat16
            )
            return res.tokens[..., :1], res.lengths

        return decode

    # pick a "typical" eos: the most common token the model emits at steps >= 6
    probe = decode_fn((L,), eos=cfg.vocab_size - 1)
    toks, lens = probe(params, enc)
    print("no-EOS probe lengths:", np.asarray(lens).ravel()[:8], flush=True)
    # re-decode once more grabbing full tokens for the histogram
    dcfg_probe = DecodeConfig(
        beam_size=3, how_many_outputs=1, max_seq_len=L, sos_idx=cfg.sos_idx,
        eos_idx=cfg.vocab_size - 1, chunk_schedule=(L,),
    )
    full = jax.jit(
        lambda p, e: bs.beam_search(p, cfg, e, dcfg_probe, rng=rng,
                                    dtype=jnp.bfloat16).tokens
    )(params, enc)
    hist = collections.Counter(np.asarray(full)[:, 0, 8:30].ravel().tolist())
    typical_eos = int(hist.most_common(1)[0][0])
    print(f"typical-exit eos token: {typical_eos} "
          f"(count {hist.most_common(1)[0][1]})", flush=True)

    schedules = {
        "single(74)": (L,),
        "chunked(24,48,74)": (24, 48, L),
        "dense(12,24,40,56,74)": (12, 24, 40, 56, L),  # round-4 default
    }
    for name, sched in schedules.items():
        for wl, eos in (("no-EOS ", cfg.vocab_size - 1),
                        ("typical", typical_eos)):
            fn = decode_fn(sched, eos)
            _, lens = fn(params, enc)
            mean_len = float(np.asarray(lens).mean())
            t = timed(fn, params, enc, iters=iters)
            print(
                f"b{batch} beam3 L{L} {name:18s} {wl}: {t:8.2f} ms"
                f"   mean caption len {mean_len:5.1f}",
                flush=True,
            )

    # ---- eval workload: EVERY beam EOSes by ~step K (what trained
    # checkpoints do on COCO — captions run 10-20 tokens), emulated by
    # boosting the EOS logit once pos >= K. Uses the production beam_loop /
    # dec_step wiring; only the logit override is benchmark-local.
    from on_device_image_captioning_tpu.decode import cache as dc

    def decode_forced(schedule, k_stop):
        dcfg = DecodeConfig(
            beam_size=3, how_many_outputs=1, max_seq_len=L,
            sos_idx=cfg.sos_idx, eos_idx=7, chunk_schedule=schedule,
        )

        @jax.jit
        def fn(p, e):
            state = dc.init_state(p, cfg, e, schedule[0], jnp.bfloat16)
            muts, static = dc.split_state(state)

            def step_fn(m, tokens, pos, reorder=None, group=1, dst=None):
                st = dc.merge_state(m, static)
                logp, ns = dc.dec_step(
                    p, cfg, st, tokens, pos, jnp.bfloat16, reorder=reorder,
                    group=group, prev=dst,
                )
                is_eos_col = (
                    jax.lax.broadcasted_iota(jnp.int32, logp.shape, 1) == 7
                )
                logp = jnp.where((pos >= k_stop) & is_eos_col, 1e3, logp)
                return logp, dc.split_state(ns)[0]

            res = bs.beam_loop(
                step_fn, muts, e.shape[0], dcfg, rng=rng, chunks=schedule
            )
            return res.tokens[..., :1], res.lengths

        return fn

    for name, sched in schedules.items():
        for k_stop in (18,):
            fn = decode_forced(sched, k_stop)
            _, lens = fn(params, enc)
            mean_len = float(np.asarray(lens).mean())
            t = timed(fn, params, enc, iters=iters)
            print(
                f"b{batch} beam3 L{L} {name:18s} all-EOS@{k_stop}: "
                f"{t:8.2f} ms   mean caption len {mean_len:5.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
