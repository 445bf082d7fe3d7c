"""Capture a device trace of the fused-kernel backbone forward at a given
batch and print the per-op device-time table (top N), using
tensorboard_plugin_profile to parse the xplane.

    python scripts/profile_backbone.py [batch] [what: backbone|e2e|train]
"""
import glob
import gzip
import json
import os
import sys
import tempfile

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


def build(what, batch):
    import dataclasses

    from on_device_image_captioning_tpu.config import (
        DecodeConfig, end_expansionnet_v2_coco,
    )
    from on_device_image_captioning_tpu.models import end_to_end, swin
    from on_device_image_captioning_tpu.utils.image import normalize_on_device

    cfg = end_expansionnet_v2_coco(compute_dtype=jnp.bfloat16)
    cfg = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, attention_impl="fused")
    )
    params = end_to_end.init(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (batch, 384, 384, 3), dtype=np.uint8
        )
    )
    if what == "backbone":

        @jax.jit
        def fn(p, imgs):
            x = normalize_on_device(imgs)
            y = swin.swin_apply(p["swin"], cfg.swin, x, dtype=cfg.compute_dtype)
            return jnp.sum(y.astype(jnp.float32))

        return fn, (params, images)
    if what == "train":
        from on_device_image_captioning_tpu.train.radam import radam
        from on_device_image_captioning_tpu.train.train_step import (
            init_train_state, make_xe_step,
        )

        cfg2 = dataclasses.replace(
            cfg, swin=dataclasses.replace(cfg.swin, drop_path_rate=0.1)
        )
        opt = radam(2e-5)
        state = init_train_state(params, opt)
        step = make_xe_step(cfg2, opt, end_to_end_model=True, remat=True)
        rng = np.random.default_rng(0)
        batch_data = {
            "enc_input": jnp.asarray(
                rng.standard_normal((batch, 384, 384, 3), dtype=np.float32)
            ),
            "captions": jnp.asarray(
                rng.integers(0, cfg.captioner.vocab_size, (batch, 28)), jnp.int32
            ),
        }

        @jax.jit
        def fn(state, batch_data):
            st, m = step(state, batch_data, jax.random.PRNGKey(1))
            # anchor the updated state so XLA can't dead-code-eliminate the
            # backward pass + optimizer (returning only the loss would)
            anchor = jax.tree.reduce(
                lambda a, b: a + jnp.sum(b).astype(jnp.float32),
                st.params, jnp.float32(0),
            )
            return m["loss"] + 0.0 * anchor

        return fn, (state, batch_data)

    from on_device_image_captioning_tpu.decode import beam_search as bs
    from on_device_image_captioning_tpu.decode.cache import set_dyn_step_impl

    set_dyn_step_impl("pallas")
    dcfg = DecodeConfig(beam_size=3, how_many_outputs=1, max_seq_len=20)

    @jax.jit
    def fn(p, imgs):
        x = normalize_on_device(imgs)
        enc = end_to_end.forward_enc(p, cfg, x)
        res = bs.beam_search(
            p["captioner"], cfg.captioner, enc, dcfg, dtype=cfg.compute_dtype
        )
        return res.tokens

    return fn, (params, images)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    what = sys.argv[2] if len(sys.argv) > 2 else "backbone"
    fn, args = build(what, batch)
    out = fn(*args)
    jax.device_get(out)  # compile + warm

    tmp = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tmp)
    for _ in range(3):
        out = fn(*args)
    jax.device_get(out)
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    assert xplanes, f"no xplane under {tmp}"
    try:
        from xprof.convert import raw_to_tool_data as rttd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    data, _ = rttd.xspace_to_tool_data(xplanes, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data) if data.lstrip().startswith("[") else None
    if rows is None:
        # gviz table json: parse the 'rows' of the first table
        blob = json.loads(data)
        print(json.dumps(blob)[:2000])
        return
    print(f"{'op':60s} {'device_us':>12s} {'%':>6s}")
    total = sum(r.get("total_self_time_us", r.get("device_time_us", 0)) for r in rows)
    for r in rows[:40]:
        t = r.get("total_self_time_us", r.get("device_time_us", 0))
        print(f"{str(r.get('op_name', r))[:60]:60s} {t:12.0f} {100*t/max(total,1):6.1f}")


if __name__ == "__main__":
    main()
