"""Per-HLO-op device-time table via xprof's hlo_stats (the
tensorboard_plugin_profile parser is broken in this environment — protobuf
mismatch; xprof.convert.raw_to_tool_data on the captured xplane works).

    python scripts/profile_hlo.py [batch] [what: backbone|e2e|decode] [topn]
"""
import glob
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
    from on_device_image_captioning_tpu.decode import beam_search as bs
    from on_device_image_captioning_tpu.decode.cache import set_dyn_step_impl
    from on_device_image_captioning_tpu.models import end_to_end, swin, captioner
    from on_device_image_captioning_tpu.ops import swin_block_fused as sbf
    from on_device_image_captioning_tpu.utils.image import normalize_on_device

    sbf.set_transition_impl(os.environ.get("PROF_TRANSITION", "gather"))
    sbf.set_infer_attn_rows_impl(os.environ.get("PROF_ATTN", "perhead"))
    set_dyn_step_impl("pallas")
    cfg = end_expansionnet_v2_coco(compute_dtype=jnp.bfloat16)
    cfg = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, attention_impl="fused")
    )
    params = end_to_end.init(jax.random.PRNGKey(0), cfg)
    if what != "train":  # inference graphs run with pre-expanded rel biases
        params = end_to_end.prepare_inference_params(params, cfg)
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (batch, 384, 384, 3), np.uint8)
    )
    if what == "backbone":

        @jax.jit
        def fn(p, x):
            y = swin.swin_apply(
                p["swin"], cfg.swin, normalize_on_device(x),
                dtype=cfg.compute_dtype,
            )
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
                rng.integers(0, cfg.captioner.vocab_size, (batch, 28)),
                jnp.int32,
            ),
        }

        @jax.jit
        def fn(state, batch_data):
            st, m = step(state, batch_data, jax.random.PRNGKey(1))
            # anchor the updated state so XLA can't DCE backward + optimizer
            anchor = jax.tree.reduce(
                lambda a, b: a + jnp.sum(b).astype(jnp.float32),
                st.params, jnp.float32(0),
            )
            return m["loss"] + 0.0 * anchor

        return fn, (state, batch_data)

    if what == "decode":
        feats = jax.jit(
            lambda p, x: swin.swin_apply(
                p["swin"], cfg.swin, normalize_on_device(x),
                dtype=cfg.compute_dtype,
            )
        )(params, images)
        enc = jax.jit(
            lambda p, f: captioner.forward_enc(
                p["captioner"], cfg.captioner, f, dtype=cfg.compute_dtype
            )
        )(params, feats)
        dcfg = DecodeConfig(beam_size=3, how_many_outputs=1, max_seq_len=20)

        @jax.jit
        def fn(p, e):
            res = bs.beam_search(
                p["captioner"], cfg.captioner, e, dcfg,
                rng=jax.random.PRNGKey(1), dtype=cfg.compute_dtype,
            )
            return res.tokens

        return fn, (params, enc)

    dcfg = DecodeConfig(beam_size=3, how_many_outputs=1, max_seq_len=20)

    @jax.jit
    def fn(p, x):
        enc = end_to_end.forward_enc(p, cfg, normalize_on_device(x))
        res = bs.beam_search(
            p["captioner"], cfg.captioner, enc, dcfg,
            rng=jax.random.PRNGKey(1), dtype=cfg.compute_dtype,
        )
        return res.tokens

    return fn, (params, images)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    what = sys.argv[2] if len(sys.argv) > 2 else "backbone"
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    fn, args = build(what, batch)
    out = fn(*args)
    jax.device_get(out)  # compile+warm

    tmp = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(tmp):
        for _ in range(3):
            out = fn(*args)
        jax.device_get(out)

    from xprof.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data[data.index("{"):]) if isinstance(data, str) else data
    rows = []
    cols = [c["label"] for c in table["cols"]]
    for r in table["rows"]:
        vals = dict(zip(cols, [c["v"] for c in r["c"]]))
        rows.append(vals)
    key_time = next(
        k for k in rows[0]
        if "total" in k.lower() and ("us" in k.lower() or "time" in k.lower())
        and "self" in k.lower()
    )
    # column labels vary by xprof build ("HLO op name" vs "HLO Op Name") —
    # match case-insensitively and require the values to actually vary
    # (some builds put the constant program id first)
    name_key = next(
        (k for k in rows[0]
         if k.lower() in ("hlo op name", "op name", "hlo op expression")
         and len({str(r.get(k, "")) for r in rows[:50]}) > 1),
        cols[1],
    )
    cat_key = next((k for k in rows[0] if "categor" in k.lower()), None)
    bound_key = next((k for k in rows[0] if "bound" in k.lower()), None)
    rows.sort(key=lambda r: -float(r[key_time] or 0))
    total = sum(float(r[key_time] or 0) for r in rows)
    print(f"{what} b{batch}: total self-time {total:.0f} us over 3 iters "
          f"-> {total / 3000:.2f} ms/iter")
    print(f"{'us':>10}  {'%':>5}  {'bound':12}  op")
    cat_filter = os.environ.get("PROF_CAT")  # substring match on category
    shown = [
        r for r in rows
        if not cat_filter or (cat_key and cat_filter in str(r.get(cat_key, "")))
    ]
    for r in shown[:topn]:
        t = float(r[key_time] or 0)
        nm = str(r.get(name_key, ""))[:110]
        bd = str(r.get(bound_key, ""))[:12] if bound_key else ""
        print(f"{t:10.0f}  {100 * t / total:5.1f}  {bd:12}  {nm}")
    # category rollup
    if cat_key:
        agg = {}
        for r in rows:
            agg[r[cat_key]] = agg.get(r[cat_key], 0.0) + float(r[key_time] or 0)
        print("\nby category:")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"  {v:10.0f} us {100 * v / total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
