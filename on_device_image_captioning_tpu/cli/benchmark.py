"""Benchmarking CLI: params, analytic FLOPs, latency distribution, optional
pruning rounds and quantized variants, with plots.

Capability parity with the reference benchmark suite
(reference benchmarking/benchmarking.py: thop FLOPs :24-55, param count :58-66,
100-run latency + matplotlib plots :69-121, pruning rounds :123-151; quantized
variant in benchmarking/quantized_benchmarking.py).

    python -m on_device_image_captioning_tpu.cli.benchmark \
        [--load_path ckpt] [--runs 100] [--batch_size 1] [--beam_size 5] \
        [--prune_rounds 2] [--quantize w8] [--plot out.png]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure_latency(fn, args, runs: int):
    fn(*args)  # compile + warmup
    jax.device_get(fn(*args))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(out)  # tunnel-safe sync (see bench.py)
        times.append(time.perf_counter() - t0)
    return np.asarray(times)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Benchmarking")
    parser.add_argument("--load_path", type=str, default=None,
                        help="checkpoint; random weights when omitted")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--beam_size", type=int, default=5)
    parser.add_argument("--max_seq_len", type=int, default=20)
    parser.add_argument("--runs", type=int, default=100)
    parser.add_argument("--param_config", type=int, default=0, choices=[0, 1, 2])
    parser.add_argument("--prune_rounds", type=int, default=0)
    parser.add_argument("--prune_amount", type=float, default=0.33)
    parser.add_argument("--quantize", choices=["none", "w8", "w8a8"], default="none")
    parser.add_argument("--plot", type=str, default=None)
    parser.add_argument("--trace", type=str, default=None,
                        help="capture a short jax.profiler device trace (compile "
                             "+ warmup + up to 5 runs) into this directory "
                             "before the untraced measurement loop "
                             "(TensorBoard/XProf-loadable)")
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--fp32", dest="bf16", action="store_false")
    parser.add_argument("--attention_impl", choices=["xla", "pallas", "fused"],
                        default="fused",
                        help="Swin path: 'fused' = whole-block/half-block "
                             "Pallas kernels (fastest, inference); 'xla' = "
                             "reference-faithful op order")
    parser.add_argument("--dyn_step_impl", choices=["xla", "pallas"],
                        default="pallas",
                        help="incremental decode step implementation")
    args = parser.parse_args(argv)
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from ..config import DecodeConfig, end_expansionnet_v2_coco, remove_layers
    from ..decode import beam_search as bs
    from ..deploy import analysis
    from ..deploy.pruning import global_l1_prune, sparsity_report
    from ..deploy.quantization import quantize_tree
    from ..models import end_to_end
    from ..utils.image import normalize_on_device
    from .demo import load_params

    import dataclasses

    from ..decode.cache import set_dyn_step_impl

    cfg = end_expansionnet_v2_coco(
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    cfg = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, attention_impl=args.attention_impl)
    )
    cfg = remove_layers(cfg, args.param_config)
    set_dyn_step_impl(args.dyn_step_impl)
    if args.load_path:
        params = load_params(args.load_path, cfg)
    else:
        params = end_to_end.init(jax.random.PRNGKey(0), cfg)

    results = {
        "params": analysis.param_count(params),
        "flops": analysis.beam_search_flops(
            cfg, args.beam_size, args.max_seq_len
        ),
        "flops_reference_strategy": analysis.beam_search_flops(
            cfg, args.beam_size, args.max_seq_len, incremental=False
        )["total"],
    }

    if args.prune_rounds:
        for r in range(args.prune_rounds):
            params = global_l1_prune(params, args.prune_amount)
            rep = sparsity_report(params)
            print(f"prune round {r + 1}: global sparsity {rep['GLOBAL']:.3f}",
                  flush=True)
        results["global_sparsity"] = sparsity_report(params)["GLOBAL"]
    if args.quantize != "none":
        params = quantize_tree(params, args.quantize)
        results["quantized"] = args.quantize

    dcfg = DecodeConfig(
        beam_size=args.beam_size, how_many_outputs=1, max_seq_len=args.max_seq_len
    )

    @jax.jit
    def caption(params, images_u8):
        x = normalize_on_device(images_u8)
        enc = end_to_end.forward_enc(params, cfg, x)
        res = bs.beam_search(
            params["captioner"], cfg.captioner, enc, dcfg, dtype=cfg.compute_dtype
        )
        return res.tokens

    imgs = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (args.batch_size, cfg.swin.img_size, cfg.swin.img_size, 3),
            dtype=np.uint8,
        )
    )
    # after the param-count/sparsity reports: pre-expand Swin rel-pos biases
    params = end_to_end.prepare_inference_params(params, cfg)
    params = jax.device_put(params)
    if args.trace:
        from ..utils.profiling import trace

        with trace(args.trace):
            measure_latency(caption, (params, imgs), min(args.runs, 5))
        print(f"trace written to {args.trace}", flush=True)
    times = measure_latency(caption, (params, imgs), args.runs)
    results["latency_s"] = {
        "mean": float(times.mean()), "p50": float(np.percentile(times, 50)),
        "p90": float(np.percentile(times, 90)), "min": float(times.min()),
    }
    results["images_per_sec"] = args.batch_size / float(np.percentile(times, 50))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 2, figsize=(10, 4))
        ax[0].plot(times * 1e3)
        ax[0].set_xlabel("run")
        ax[0].set_ylabel("latency (ms)")
        ax[0].set_title(
            f"b{args.batch_size} beam{args.beam_size}: "
            f"p50 {results['latency_s']['p50'] * 1e3:.1f} ms"
        )
        ax[1].hist(times * 1e3, bins=30)
        ax[1].set_xlabel("latency (ms)")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"plot saved to {args.plot}", flush=True)

    print(json.dumps(results, indent=2), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
