"""A/B the round-3 backbone optimizations on the real TPU at a given batch:
inter-block transition impl (gather vs in-kernel one-hot dots), inference
attention inner loop (perhead vs grouped), and the stage-3 attention-core
kernel (on by default with attention_impl='fused'; 'xla' rows give the
pre-core baseline).

Pipelined-enqueue timing (enqueue K iters, sync once) per the STATUS
operational note: per-call tunnel sync latency drifts by tens of ms per day,
pipelined numbers stay comparable.

    python scripts/bench_transitions.py [batch] [iters]
"""
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

from on_device_image_captioning_tpu.config import swin_large_384
from on_device_image_captioning_tpu.models import swin
from on_device_image_captioning_tpu.ops import swin_block_fused as sbf


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = dataclasses.replace(swin_large_384(), attention_impl="fused")
    params = swin.swin_init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, cfg.img_size, cfg.img_size, 3), dtype=np.float32
        )
    )

    combos = [
        ("gather", "perhead"),
        ("kernel", "perhead"),
        ("gather", "grouped"),
        ("kernel", "grouped"),
    ]
    results = {}
    for trans, attn in combos:
        sbf.set_transition_impl(trans)
        sbf.set_infer_attn_rows_impl(attn)

        @jax.jit
        def fwd(p, x):
            return jnp.sum(
                swin.swin_apply(p, cfg, x, dtype=jnp.bfloat16).astype(
                    jnp.float32
                )
            )

        t0 = time.time()
        r = jax.device_get(fwd(params, imgs))
        print(f"{trans}/{attn}: first call {time.time() - t0:.1f}s "
              f"sum={float(r):.2f}", flush=True)
        jax.device_get(fwd(params, imgs))
        t0 = time.time()
        rs = [fwd(params, imgs) for _ in range(iters)]
        jax.device_get(rs[-1])
        per = (time.time() - t0) * 1000 / iters
        results[(trans, attn)] = per
        print(f"{trans}/{attn}: pipelined {per:.2f} ms/fwd (b{batch} bf16)",
              flush=True)
        fwd.clear_cache()
    sbf.set_transition_impl("gather")
    sbf.set_infer_attn_rows_impl("perhead")
    print("\nsummary:")
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {k[0]:7s} + {k[1]:8s}: {v:7.2f} ms/fwd")


if __name__ == "__main__":
    main()
