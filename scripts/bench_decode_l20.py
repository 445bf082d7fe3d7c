"""Chunk-schedule sweep for the SHORT (TRT-budget, L=20) decode that bench.py's
headline throughput runs (reference decode budget:
onnx4tensorrt/End_ExpansionNet_v2_onnx_tensorrt.py:10-11).

The per-step Pallas dyn-step kernels are bandwidth-bound on the (B*beams, L,
E, d) vals caches (STATUS.md: 10.4 of 13.67 ms device time at b32/beam3/L20),
and that traffic scales with the CURRENT cache length — so even the short
budget should profit from a two-phase schedule: steps 2..c1 run on c1-slot
caches instead of 20-slot ones. Random weights never EOS, so every variant
runs the full 19 steps (worst case, same as the headline bench).

    python scripts/bench_decode_l20.py [batch] [iters]
"""
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


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # compile+warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.device_get(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from on_device_image_captioning_tpu.config import (
        DecodeConfig, end_expansionnet_v2_coco,
    )
    from on_device_image_captioning_tpu.decode import beam_search as bs
    from on_device_image_captioning_tpu.decode.cache import set_dyn_step_impl
    from on_device_image_captioning_tpu.models.captioner import captioner_init

    set_dyn_step_impl("pallas")
    cfg = end_expansionnet_v2_coco(compute_dtype=jnp.bfloat16).captioner
    params = captioner_init(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(1)
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 144, cfg.d_model)),
        jnp.bfloat16,
    )

    L = 20
    schedules = [(L,), (12, L), (10, L), (10, 16, L)]
    ref_toks = None
    for sched in schedules:
        dcfg = DecodeConfig(
            beam_size=3, how_many_outputs=1, max_seq_len=L,
            sos_idx=cfg.sos_idx, eos_idx=cfg.eos_idx, chunk_schedule=sched,
        )

        @jax.jit
        def decode(p, e, dcfg=dcfg):
            res = bs.beam_search(p, cfg, e, dcfg, rng=rng, dtype=jnp.bfloat16)
            return res.tokens, res.lengths

        toks, _ = decode(params, enc)
        toks = np.asarray(toks)
        if ref_toks is None:
            ref_toks = toks
        tag = "OK " if np.array_equal(toks, ref_toks) else "MISMATCH"
        t = timed(decode, params, enc, iters=iters)
        print(f"b{batch} beam3 L{L} chunks={str(sched):14s}: {t:7.2f} ms"
              f"   tokens {tag}", flush=True)


if __name__ == "__main__":
    main()
