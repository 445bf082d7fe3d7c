"""Per-phase throughput breakdown on the real TPU at the bench.py operating
point (Swin-L/384, bf16, fused kernels, Pallas decode step, beam 3, 20 steps).

Phases timed separately with the pipelined-enqueue discipline bench.py uses
(enqueue N iterations, one device_get sync) so the tunnel round trip amortizes:

  backbone   normalize + Swin-L forward
  enc_head   expansion encoder over backbone output
  decode     incremental beam search over a fixed encoder output
  e2e        the full caption step (cross-check vs bench.py)

    python scripts/bench_breakdown.py [batch] [iters]
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
    from on_device_image_captioning_tpu.models import end_to_end, captioner, swin
    from on_device_image_captioning_tpu.utils.image import normalize_on_device

    set_dyn_step_impl("pallas")
    cfg = end_expansionnet_v2_coco(compute_dtype=jnp.bfloat16)
    cfg = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, attention_impl="fused")
    )
    dcfg = DecodeConfig(beam_size=3, how_many_outputs=1, max_seq_len=20)
    params = end_to_end.prepare_inference_params(
        end_to_end.init(jax.random.PRNGKey(0), cfg), cfg
    )
    rng = jax.random.PRNGKey(1)
    images = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (batch, 384, 384, 3), dtype=np.uint8
        )
    )

    # phases return SCALARS: the axon tunnel eagerly ships outputs host-side,
    # so returning the (B, 144, 1536) features would time the tunnel, not the
    # chip (same discipline as scripts/bench_backbone.py)
    @jax.jit
    def backbone(p, imgs):
        x = normalize_on_device(imgs)
        y = swin.swin_apply(p["swin"], cfg.swin, x, dtype=cfg.compute_dtype)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def backbone_feats(p, imgs):
        x = normalize_on_device(imgs)
        return swin.swin_apply(p["swin"], cfg.swin, x, dtype=cfg.compute_dtype)

    @jax.jit
    def enc_head(p, feats):
        y = captioner.forward_enc(
            p["captioner"], cfg.captioner, feats, dtype=cfg.compute_dtype
        )
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def enc_head_feats(p, feats):
        return captioner.forward_enc(
            p["captioner"], cfg.captioner, feats, dtype=cfg.compute_dtype
        )

    @jax.jit
    def decode(p, enc):
        res = bs.beam_search(
            p["captioner"], cfg.captioner, enc, dcfg, rng=rng,
            dtype=cfg.compute_dtype,
        )
        return res.tokens

    @jax.jit
    def e2e(p, imgs):
        x = normalize_on_device(imgs)
        enc = end_to_end.forward_enc(p, cfg, x)
        res = bs.beam_search(
            p["captioner"], cfg.captioner, enc, dcfg, rng=rng,
            dtype=cfg.compute_dtype,
        )
        return res.tokens

    feats = backbone_feats(params, images)
    enc = enc_head_feats(params, feats)

    t_bb = timed(backbone, params, images, iters=iters)
    t_eh = timed(enc_head, params, feats, iters=iters)
    t_dec = timed(decode, params, enc, iters=iters)
    t_e2e = timed(e2e, params, images, iters=iters)
    print(f"b{batch} bf16 fused+pallas, pipelined ms/iter over {iters}:")
    print(f"  backbone  {t_bb:8.2f} ms")
    print(f"  enc_head  {t_eh:8.2f} ms")
    print(f"  decode    {t_dec:8.2f} ms   ({t_dec / 19:.3f} ms/step @19 steps)")
    print(f"  sum       {t_bb + t_eh + t_dec:8.2f} ms")
    print(f"  e2e       {t_e2e:8.2f} ms   -> {batch / t_e2e * 1000:.1f} img/s")


if __name__ == "__main__":
    main()
