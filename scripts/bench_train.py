"""End-to-end XE training-step throughput on the real TPU (single chip).

The reference's headline claim is *fast end-to-end training* (arXiv:2208.06551);
this measures the Swin-L/384 + expansion-head cross-entropy step — forward,
backward, RAdam update — at a training batch, with and without Swin remat.
Pipelined-enqueue timing discipline (scalar loss output, one sync).

    python scripts/bench_train.py [batch] [iters] [remat(0|1)] [impl]

impl: xla (default) or fused — fused runs Swin stages 0/1 through the
training-capable fused block kernels (ops/swin_block_fused.py custom VJP).
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    remat = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    impl = sys.argv[4] if len(sys.argv) > 4 else "xla"

    from on_device_image_captioning_tpu.config import end_expansionnet_v2_coco
    from on_device_image_captioning_tpu.models import end_to_end
    from on_device_image_captioning_tpu.train.radam import radam
    from on_device_image_captioning_tpu.train.train_step import (
        init_train_state, make_xe_step,
    )

    import dataclasses

    cfg = end_expansionnet_v2_coco(compute_dtype=jnp.bfloat16)
    cfg = dataclasses.replace(
        cfg,
        swin=dataclasses.replace(
            cfg.swin, attention_impl=impl if impl != "xla" else "xla",
            drop_path_rate=0.1,
        ),
    )
    params = end_to_end.init(jax.random.PRNGKey(0), cfg)
    opt = radam(2e-5)
    state = init_train_state(params, opt)
    step = jax.jit(make_xe_step(cfg, opt, end_to_end_model=True, remat=remat))

    rng = np.random.default_rng(0)
    T = 28  # typical COCO caption length incl. SOS/EOS after batching
    batch_data = {
        "enc_input": jnp.asarray(
            rng.standard_normal((batch, 384, 384, 3), dtype=np.float32)
        ),
        "captions": jnp.asarray(
            rng.integers(0, cfg.captioner.vocab_size, (batch, T)), jnp.int32
        ),
    }
    key = jax.random.PRNGKey(1)

    state, metrics = step(state, batch_data, key)  # compile
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data, key)
    jax.device_get(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(
        f"xe_step b{batch} remat={int(remat)} impl={impl}: {dt * 1000:.1f} ms/step "
        f"-> {batch / dt:.2f} img/s (fwd+bwd+radam, Swin-L 384, bf16)"
    )


if __name__ == "__main__":
    main()
