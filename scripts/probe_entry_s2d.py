"""A/B probe: device-side space-to-depth entry vs host-side s2d upload.

Current entry (bench.py / _swin_apply_window_resident): upload u8 NHWC, then
on device u8->f32 normalize (56 MB write at b32) -> 6D transpose s2d
(56 MB -> 56 MB) -> bf16 cast (28 MB) -> patch_embed_fused. The transpose
chain is the last 'data formatting' block in the backbone profile
(STATUS.md round-3 continuation 3: ~2.4 ms/fwd at b32).

Candidate: do the s2d permutation on HOST numpy over uint8 (pure data
movement, same 14 MB upload), then the device runs ONE fused elementwise
pass u8 -> normalized bf16 (14 MB read, 28 MB write) straight into the
kernel. Bitwise-identical values (same per-element ops, same order).

Usage: python scripts/probe_entry_s2d.py [batch]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from on_device_image_captioning_tpu.utils.image import (
    IMAGENET_MEAN, IMAGENET_STD, normalize_on_device,
)
from on_device_image_captioning_tpu.ops import stage_boundary as sb
from on_device_image_captioning_tpu.models import swin as swin_mod
from on_device_image_captioning_tpu.config import SwinConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
PS, IMG, WIN = 4, 384, 12
cfg = SwinConfig()
key = jax.random.PRNGKey(0)
params = swin_mod.swin_init(key, cfg)
pe = params["patch_embed"]
proj, norm = pe["proj"], pe["norm"]

rng = np.random.default_rng(0)
imgs = rng.integers(0, 256, (B, IMG, IMG, 3), dtype=np.uint8)
# host s2d: (B, H/ps, ps, W/ps, ps, 3) -> (B, H/ps, W/ps, ps*ps*3)
t0 = time.perf_counter()
imgs_s2d = np.ascontiguousarray(
    imgs.reshape(B, IMG // PS, PS, IMG // PS, PS, 3).transpose(0, 1, 3, 2, 4, 5)
).reshape(B, IMG // PS, IMG // PS, PS * PS * 3)
host_ms = (time.perf_counter() - t0) * 1000
print(f"host s2d permute of {imgs.nbytes/1e6:.0f} MB uint8: {host_ms:.1f} ms")

mean48 = jnp.asarray(np.tile(IMAGENET_MEAN, PS * PS), jnp.float32)
std48 = jnp.asarray(np.tile(IMAGENET_STD, PS * PS), jnp.float32)


@jax.jit
def entry_device_s2d(images_u8):
    x = normalize_on_device(images_u8)
    x = x.reshape(B, IMG // PS, PS, IMG // PS, PS, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, IMG // PS, IMG // PS, 48)
    x = x.astype(jnp.bfloat16)
    return sb.patch_embed_fused(x, proj, norm, WIN, cfg.ln_eps)


@jax.jit
def entry_host_s2d(images_u8_s2d):
    x = images_u8_s2d.astype(jnp.float32) / 255.0
    x = ((x - mean48) / std48).astype(jnp.bfloat16)
    return sb.patch_embed_fused(x, proj, norm, WIN, cfg.ln_eps)


d_imgs = jnp.asarray(imgs)
d_s2d = jnp.asarray(imgs_s2d)

a = entry_device_s2d(d_imgs)
b = entry_host_s2d(d_s2d)
print("parity (bitwise):", bool(jnp.all(a == b)))

def bench(f, x, iters=50):
    f(x).block_until_ready()
    # pipelined enqueue: sync once at the end so the tunnel isn't measured
    t0 = time.perf_counter()
    outs = [f(x) for _ in range(iters)]
    outs[-1].block_until_ready()
    return (time.perf_counter() - t0) / iters * 1000

ta = bench(entry_device_s2d, d_imgs)
tb = bench(entry_host_s2d, d_s2d)
print(f"entry device-s2d: {ta:.3f} ms   entry host-s2d: {tb:.3f} ms   "
      f"delta {ta-tb:+.3f} ms/fwd at b{B}")
