"""Fresh-compile audit of every production graph (run after kernel changes).

Round 3 found that the b16-b32 end-to-end XE training step had NEVER
compiled fresh: scoped-VMEM / SMEM overflows in the fused Swin train
kernels were masked by the persistent compilation cache, so throughput was
being measured on executables whose HLO could no longer be rebuilt. This
script compiles (AOT — `.lower().compile()`, no execution) each production
graph against a THROWAWAY cache directory, so stale entries cannot mask a
regression. Run it on the real TPU after touching ops/swin_block_fused.py,
ops/stage_boundary.py, ops/dyn_exp_step.py, or the train step.

    python scripts/compile_audit.py [--quick]

--quick compiles one training and one inference config instead of the full
matrix (the full matrix takes tens of minutes over the tunnel).
"""
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# throwaway cache: every compile below is a real fresh compile
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp(prefix="audit_"))

import dataclasses

import jax.numpy as jnp
import numpy as np


def build_cases(quick: bool):
    from on_device_image_captioning_tpu.config import (
        DecodeConfig, end_expansionnet_v2_coco,
    )
    from on_device_image_captioning_tpu.decode import beam_search as bs
    from on_device_image_captioning_tpu.decode.cache import set_dyn_step_impl
    from on_device_image_captioning_tpu.models import end_to_end
    from on_device_image_captioning_tpu.train.radam import radam
    from on_device_image_captioning_tpu.train.train_step import (
        init_train_state, make_xe_step,
    )
    from on_device_image_captioning_tpu.utils.image import normalize_on_device

    set_dyn_step_impl("pallas")
    cfg = end_expansionnet_v2_coco(compute_dtype=jnp.bfloat16)
    cfg = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, attention_impl="fused")
    )
    params = end_to_end.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    cases = []

    def train_case(batch):
        cfg_t = dataclasses.replace(
            cfg, swin=dataclasses.replace(cfg.swin, drop_path_rate=0.1)
        )
        opt = radam(2e-5)
        state = init_train_state(params, opt)
        step = jax.jit(make_xe_step(cfg_t, opt, end_to_end_model=True, remat=True))
        batch_data = {
            "enc_input": jnp.asarray(
                rng.standard_normal((batch, 384, 384, 3), dtype=np.float32)
            ),
            "captions": jnp.asarray(
                rng.integers(0, cfg.captioner.vocab_size, (batch, 28)), jnp.int32
            ),
        }
        return lambda: step.lower(state, batch_data, jax.random.PRNGKey(1)).compile()

    def infer_case(batch, beam, max_len, quant):
        p = params
        if quant != "none":
            from on_device_image_captioning_tpu.deploy.quantization import (
                quantize_tree,
            )

            p = quantize_tree(params, mode=quant)
        dcfg = DecodeConfig(beam_size=beam, how_many_outputs=1, max_seq_len=max_len)
        images = jnp.asarray(
            rng.integers(0, 256, (batch, 384, 384, 3), np.uint8)
        )

        @jax.jit
        def fn(p, x):
            enc = end_to_end.forward_enc(p, cfg, normalize_on_device(x))
            res = bs.beam_search(
                p["captioner"], cfg.captioner, enc, dcfg,
                rng=jax.random.PRNGKey(1), dtype=cfg.compute_dtype,
            )
            return res.tokens

        return lambda: fn.lower(p, images).compile()

    if quick:
        cases.append(("xe_train_b16_remat", train_case(16)))
        cases.append(("infer_b32_beam3_L20", infer_case(32, 3, 20, "none")))
    else:
        for b in (16, 24, 32):
            cases.append((f"xe_train_b{b}_remat", train_case(b)))
        cases.append(("infer_b32_beam3_L20", infer_case(32, 3, 20, "none")))
        cases.append(("infer_b64_beam3_L20", infer_case(64, 3, 20, "none")))
        cases.append(("infer_b1_beam5_L74_p50", infer_case(1, 5, 74, "none")))
        # bench.py's eval-workload scoreboard row (b32/beam3/L74 chunked)
        cases.append(("infer_b32_beam3_L74_eval", infer_case(32, 3, 74, "none")))

        # the fused shared-forward SCST step (bench.py scoreboard / --reinforce
        # --device_reward): one jit of encoder-fwd-via-vjp + sampling + device
        # CIDEr-D + REINFORCE grad + RAdam — exercises the train kernels AND
        # the sampling decode path in one graph
        def scst_case(batch=16, num_samples=5, scst_max_len=20):
            from on_device_image_captioning_tpu.data.text import (
                EOS_TOKEN, PAD_TOKEN, SOS_TOKEN, UNK_TOKEN, Vocab,
            )
            from on_device_image_captioning_tpu.train.device_cider import (
                DeviceCiderCorpus,
            )
            from on_device_image_captioning_tpu.train.train_step import (
                make_scst_fused_step,
            )

            words = [PAD_TOKEN, SOS_TOKEN, EOS_TOKEN, UNK_TOKEN] + [
                f"w{i}" for i in range(cfg.captioner.vocab_size - 4)
            ]
            vocab = Vocab({w: i for i, w in enumerate(words)})
            srng = np.random.default_rng(0)
            refs = [
                [" ".join(srng.choice(words[4:1000], size=srng.integers(8, 14)))
                 for _ in range(5)]
                for _ in range(50)
            ]
            dcorpus = DeviceCiderCorpus(refs, vocab)
            opt = radam(1e-5)
            state = init_train_state(params, opt)
            shared = jax.jit(
                make_scst_fused_step(
                    cfg, opt, end_to_end_model=True, num_samples=num_samples,
                    scst_max_len=scst_max_len, sos_idx=vocab.sos_idx,
                    eos_idx=vocab.eos_idx, reward_fn=dcorpus.make_reward_fn(),
                )
            )
            images = jnp.asarray(
                srng.standard_normal((batch, 384, 384, 3), dtype=np.float32)
            )
            bt = {k: jnp.asarray(v)
                  for k, v in dcorpus.batch(srng.integers(0, 50, batch)).items()}
            return lambda: shared.lower(
                state, {"enc_input": images}, bt, jax.random.PRNGKey(1)
            ).compile()

        cases.append(("scst_fused_b16x5_L20", scst_case()))
        cases.append(("infer_b64_beam3_L20_w8", infer_case(64, 3, 20, "w8")))
    return cases


def build_fuzz_cases(n, seed):
    """Randomized shape sweep (VERDICT r4 item 7): batch values that are odd
    or not divisible by 8, beams 1..5, short/eval/full decode budgets, and
    the w8 variant — fresh-compiled against the throwaway cache. The b112
    probe proved 'accidental legality' bugs exist (ops/topk.py picked a
    28-row block that violated Mosaic's %8 sublane rule; b32/b80/b96 all
    happened to be legal), so legality must be swept, not sampled by luck."""
    from on_device_image_captioning_tpu.config import (
        DecodeConfig, end_expansionnet_v2_coco,
    )
    from on_device_image_captioning_tpu.decode import beam_search as bs
    from on_device_image_captioning_tpu.decode.cache import set_dyn_step_impl
    from on_device_image_captioning_tpu.models import end_to_end
    from on_device_image_captioning_tpu.utils.image import normalize_on_device

    set_dyn_step_impl("pallas")
    cfg = end_expansionnet_v2_coco(compute_dtype=jnp.bfloat16)
    cfg = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, attention_impl="fused")
    )
    params = end_to_end.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(seed)
    batches = [1, 3, 5, 6, 7, 9, 10, 12, 14, 17, 20, 22, 25, 26, 28, 33,
               36, 44, 52, 56, 60, 68, 76, 84, 88, 100, 104, 108, 112, 120]
    lens = [11, 20, 33, 74]

    cases = []
    seen = set()
    while len(cases) < n:
        b = int(rng.choice(batches))
        beam = int(rng.integers(1, 6))
        L = int(rng.choice(lens))
        quant = "w8" if rng.random() < 0.25 else "none"
        key = (b, beam, L, quant)
        if key in seen:
            continue
        seen.add(key)
        p = params
        if quant != "none":
            from on_device_image_captioning_tpu.deploy.quantization import (
                quantize_tree,
            )

            p = quantize_tree(params, mode=quant)
        dcfg = DecodeConfig(beam_size=beam, how_many_outputs=1, max_seq_len=L)
        images = jnp.asarray(rng.integers(0, 256, (b, 384, 384, 3), np.uint8))

        @jax.jit
        def fn(p, x, dcfg=dcfg):
            enc = end_to_end.forward_enc(p, cfg, normalize_on_device(x))
            res = bs.beam_search(
                p["captioner"], cfg.captioner, enc, dcfg,
                rng=jax.random.PRNGKey(1), dtype=cfg.compute_dtype,
            )
            return res.tokens

        tag = f"fuzz_b{b}_beam{beam}_L{L}" + ("" if quant == "none" else "_w8")
        cases.append((tag, lambda fn=fn, p=p, images=images:
                      fn.lower(p, images).compile()))
    return cases


def main():
    quick = "--quick" in sys.argv
    if "--fuzz" in sys.argv:
        i = sys.argv.index("--fuzz")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 8
        seed = int(os.environ.get("AUDIT_FUZZ_SEED", "0"))
        cases = build_fuzz_cases(n, seed)
    else:
        cases = build_cases(quick)
    failed = []
    for name, thunk in cases:
        t0 = time.perf_counter()
        try:
            thunk()
            print(f"PASS {name} ({time.perf_counter() - t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            msg = str(e).splitlines()
            head = next(
                (l for l in msg if "memory" in l.lower() or "error" in l.lower()),
                msg[0] if msg else repr(e),
            )
            print(f"FAIL {name}: {head[:300]}", flush=True)
            failed.append(name)
            if os.environ.get("AUDIT_TRACE"):
                traceback.print_exc()
    print(f"\n{len(cases) - len(failed)}/{len(cases)} fresh compiles pass")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
