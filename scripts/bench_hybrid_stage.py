"""Stage-0/1 hybrid decomposition experiment (VERDICT r3 item 4a): XLA
qkv/proj/mlp GEMMs + the weights-free attention-core kernel vs the shipping
fused whole-block kernels, measured at the production operating point
(Swin-L/384, bf16, pre-expanded biases, pipelined-enqueue timing so the
tunnel's per-sync cost amortizes).

Context (STATUS.md round-3 anatomy): stages 0/1 run ~2x their GEMM floor
because Mosaic serializes each program's LN->qkv->attention->proj->mlp chain,
while XLA runs the same GEMM shapes at ~67% of peak. The stage-2 version of
this hybrid penciled out to a wash (85 MB/block qkv round trip); stage 0's
qkv round trip is ~8x smaller per block, so the pencil-out doesn't transfer —
hence this measurement.

    python scripts/bench_hybrid_stage.py [batch] [iters]
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from on_device_image_captioning_tpu.config import swin_large_384
    from on_device_image_captioning_tpu.models import swin

    cfg = dataclasses.replace(swin_large_384(), attention_impl="fused")
    params = swin.swin_init(jax.random.PRNGKey(0), cfg)
    params = swin.prepare_inference_params(params, cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, cfg.img_size, cfg.img_size, 3), dtype=np.float32
        )
    )

    configs = {
        "baseline (full/full/halves/core)": None,
        "hybrid stage0": {0: "hybrid"},
        "hybrid stage1": {1: "hybrid"},
        "hybrid stages 0+1": {0: "hybrid", 1: "hybrid"},
    }
    ref_out = None
    for name, override in configs.items():
        swin.set_stage_mode_override(override)
        try:
            @jax.jit
            def fwd(p, x):
                return jnp.sum(
                    swin.swin_apply(p, cfg, x, dtype=jnp.bfloat16).astype(
                        jnp.float32
                    )
                )

            t0 = time.time()
            first = fwd(params, imgs)
            v = float(jax.device_get(first))
            print(f"{name}: first call {time.time() - t0:.1f}s "
                  f"(checksum {v:.1f})", flush=True)
            if ref_out is None:
                ref_out = v
            elif abs(v - ref_out) > abs(ref_out) * 1e-2:
                print(f"  WARNING checksum drift vs baseline: {ref_out:.1f}")
            # pipelined-enqueue: N forwards back to back, one sync
            t0 = time.perf_counter()
            outs = [fwd(params, imgs) for _ in range(iters)]
            jax.device_get(outs[-1])
            dt = (time.perf_counter() - t0) / iters * 1000
            print(f"{name}: {dt:.2f} ms/fwd pipelined (b{batch} bf16)",
                  flush=True)
        finally:
            swin.set_stage_mode_override(None)


if __name__ == "__main__":
    main()
