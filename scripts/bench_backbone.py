"""Backbone-only benchmark on the real TPU: XLA vs fused-block Swin-L forward.

Timing discipline for the axon tunnel (see STATUS.md): jit returns a scalar
(sum) so the device->host transfer is 4 bytes, and jax.device_get is the sync
point. Prints median ms per forward for each attention_impl.

    python scripts/bench_backbone.py [batch] [impl1,impl2,...]
"""
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from on_device_image_captioning_tpu.config import swin_large_384
from on_device_image_captioning_tpu.models import swin


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    impls = (sys.argv[2] if len(sys.argv) > 2 else "xla,fused").split(",")
    rows_impl = os.environ.get("BENCH_ATTN_ROWS")
    if rows_impl:
        from on_device_image_captioning_tpu.ops import swin_block_fused as sbf

        sbf.set_infer_attn_rows_impl(rows_impl)
        print(f"attn rows impl: {rows_impl}")
    cfg0 = swin_large_384()
    params = swin.swin_init(jax.random.PRNGKey(0), cfg0)
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, cfg0.img_size, cfg0.img_size, 3), dtype=np.float32
        )
    )
    for impl in impls:
        cfg = dataclasses.replace(cfg0, attention_impl=impl)

        @jax.jit
        def fwd(p, x):
            return jnp.sum(
                swin.swin_apply(p, cfg, x, dtype=jnp.bfloat16).astype(jnp.float32)
            )

        t0 = time.time()
        jax.device_get(fwd(params, imgs))  # compile + run
        print(f"{impl}: first call {time.time() - t0:.1f}s", flush=True)
        times = []
        for _ in range(10):
            t0 = time.time()
            jax.device_get(fwd(params, imgs))
            times.append((time.time() - t0) * 1000)
        med = float(np.median(times))
        print(
            f"{impl}: median {med:.2f} ms/fwd (b{batch} bf16), "
            f"min {min(times):.2f}, raw {[f'{t:.1f}' for t in times]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
