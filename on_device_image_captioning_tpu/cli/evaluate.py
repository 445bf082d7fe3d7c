"""Batch evaluation CLI (reference test.py): beam-decode a COCO-Karpathy or VizWiz
split and score with the metric suite, optionally per beam size.

    python -m on_device_image_captioning_tpu.cli.evaluate \
        --dataset coco --annotations dataset_coco.json --images_path ... \
        --load_path ckpt --split test --beam_sizes 3 5

Unlike the reference (one process per GPU, rank-0 scoring — test.py:339-513), this
evaluates on whatever jax.devices() offers via batch sharding, and the scorers are
in-process Python (no Java subprocesses).
"""
from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_dataset(args):
    from ..data.datasets import load_coco_karpathy, load_vizwiz
    from ..data.text import Vocab

    vocab = Vocab.from_json(args.vocab_path) if args.vocab_path else None
    if args.dataset == "coco":
        return load_coco_karpathy(args.annotations, args.images_path, vocab=vocab)
    return load_vizwiz(args.annotations, args.images_path, vocab=vocab)


def evaluate_split(
    params, cfg, dataset, split: str, beam_size: int, batch_size: int,
    max_seq_len: int, features_path: str | None = None, verbose: bool = True,
    mesh=None, metrics=("bleu", "rouge", "cider"),
):
    """Decode every image of a split and score. Returns (scores, predictions).

    (reference test.py:141-275 evaluate_model; sub-batching at :166-197.)

    mesh: optional jax.sharding.Mesh — batches are sharded on its 'data' axis and
    params placed per parallel/mesh.py rules, so an 8-chip host decodes 8-way
    data-parallel (the reference spawns one eval process per GPU,
    test.py:540-558).
    """
    from ..config import DecodeConfig
    from ..data.features_io import FeatureStore
    from ..decode import beam_search as bs
    from ..deploy.quantization import dequantize_tree
    from ..evalcap.harness import evaluate_captions
    from ..models import captioner as cap_mod
    from ..models import end_to_end
    from ..parallel import mesh as pm
    from ..utils.image import normalize_on_device, preprocess_batch

    vocab = dataset.vocab
    records = dataset.records(split)
    end2end = features_path is None
    ensemble = isinstance(params, (list, tuple))
    dcfg = DecodeConfig(
        beam_size=beam_size, how_many_outputs=1, max_seq_len=max_seq_len,
        sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx,
    )
    if mesh is not None:
        params = (
            [pm.shard_params(p, mesh) for p in params]
            if ensemble
            else pm.shard_params(params, mesh)
        )

    def put(arrays: dict) -> dict:
        return pm.shard_batch(arrays, mesh) if mesh is not None else jax.tree.map(
            jnp.asarray, arrays
        )

    if end2end:
        if ensemble:

            @jax.jit
            def decode_batch(params_list, images_u8, pads):
                x = normalize_on_device(images_u8)
                encs = [end_to_end.forward_enc(p, cfg, x) for p in params_list]
                return bs.ensemble_beam_search(
                    [dequantize_tree(p["captioner"]) for p in params_list],
                    cfg.captioner, encs, dcfg, dtype=cfg.compute_dtype,
                )

        else:

            @jax.jit
            def decode_batch(params, images_u8, pads):
                x = normalize_on_device(images_u8)
                enc = end_to_end.forward_enc(params, cfg, x)
                return bs.beam_search(
                    dequantize_tree(params["captioner"]), cfg.captioner, enc,
                    dcfg, dtype=cfg.compute_dtype,
                )

    else:
        if ensemble:

            @jax.jit
            def decode_batch(params_list, feats, pads):
                encs = [
                    cap_mod.forward_enc(p, cfg, feats, enc_num_pads=pads)
                    for p in params_list
                ]
                return bs.ensemble_beam_search(
                    [dequantize_tree(p) for p in params_list], cfg, encs,
                    dcfg, enc_num_pads=pads
                )

        else:

            @jax.jit
            def decode_batch(params, feats, pads):
                enc = cap_mod.forward_enc(params, cfg, feats, enc_num_pads=pads)
                return bs.beam_search(
                    dequantize_tree(params), cfg, enc, dcfg, enc_num_pads=pads
                )

    store = FeatureStore(features_path) if features_path else None
    predictions = {}
    t0 = time.time()

    # software pipeline (same shape as cli/generate_features): a worker
    # thread materializes the NEXT batch host-side (JPEG decode / HDF5 read
    # + tail padding — GIL-releasing C code) while the device decodes the
    # CURRENT one; the PREVIOUS result drains after the next dispatch, so
    # host IO, H2D, beam decode, and D2H overlap (the reference loads each
    # sub-batch synchronously inside the loop, test.py:166-197)
    def batches():
        for start in range(0, len(records), batch_size):
            chunk = records[start : start + batch_size]
            pad_rows = batch_size - len(chunk)  # static batch: pad the tail
            if end2end:
                imgs = preprocess_batch(
                    [r["img_path"] for r in chunk], cfg.swin.img_size
                )
                if pad_rows:
                    imgs = np.concatenate(
                        [imgs, np.repeat(imgs[-1:], pad_rows, 0)]
                    )
                yield chunk, {"x": imgs}
            else:
                feats, fpads = store.read_batch([r["img_id"] for r in chunk])
                fpads = np.asarray(fpads, np.int32)
                if pad_rows:
                    feats = np.concatenate(
                        [feats, np.repeat(feats[-1:], pad_rows, 0)]
                    )
                    fpads = np.concatenate(
                        [fpads, np.repeat(fpads[-1:], pad_rows, 0)]
                    )
                yield chunk, {"f": feats, "p": fpads}

    done = 0

    def drain(pending):
        nonlocal done
        chunk, res = pending
        caps, _ = bs.captions_from_result(res)
        for r, row in zip(chunk, caps):
            predictions[r["img_id"]] = vocab.description(row[0]).lower()
        done += len(chunk)
        if verbose:
            print(
                f"decoded {done}/{len(records)} "
                f"({done / max(time.time() - t0, 1e-9):.2f} img/s)",
                flush=True,
            )

    from ..data.prefetch import PrefetchIterator

    it = iter(batches())
    prefetch = PrefetchIterator(
        next_batch=lambda: next(it), materialize=lambda b: b, depth=2
    )
    pending = None
    while True:
        try:
            (chunk, arrays), _ = prefetch.get()
        except StopIteration:
            break
        arrays = put(arrays)
        if end2end:
            res = decode_batch(params, arrays["x"], None)
        else:
            res = decode_batch(params, arrays["f"], arrays["p"])
        if pending is not None:
            drain(pending)
        pending = (chunk, res)
    if pending is not None:
        drain(pending)
    prefetch.close()
    if store:
        store.close()

    references = {r["img_id"]: r["captions"] for r in records if r["captions"]}
    preds_for_eval = {i: predictions[i] for i in references}
    scores = evaluate_captions(
        preds_for_eval, references, metrics=metrics, verbose=verbose
    )
    return scores, predictions


def compute_evaluation_loss(
    params, cfg, dataset, split: str, batch_size: int,
    features_path: str | None = None,
):
    """Mean label-smoothing loss over a split (reference test.py:80-138)."""
    from ..data.features_io import FeatureStore
    from ..data.text import pad_batch
    from ..models import captioner as cap_mod
    from ..models import end_to_end
    from ..train.losses import label_smoothing_loss
    from ..utils.image import normalize_on_device, preprocess_batch

    vocab = dataset.vocab
    records = dataset.records(split)
    end2end = features_path is None
    store = FeatureStore(features_path) if features_path else None

    total, count = 0.0, 0
    for start in range(0, len(records), batch_size):
        chunk = records[start : start + batch_size]
        caps = [vocab.encode_caption(r["captions"][0]) for r in chunk]
        padded, _ = pad_batch(caps, vocab.pad_idx)
        toks = jnp.asarray(padded, jnp.int32)
        dec_in, targets = toks[:, :-1], toks[:, 1:]
        dec_pads = jnp.sum(dec_in == vocab.pad_idx, axis=-1)
        if end2end:
            imgs = jnp.asarray(
                preprocess_batch([r["img_path"] for r in chunk], cfg.swin.img_size)
            )
            logits = end_to_end.forward(
                params, cfg, normalize_on_device(imgs), dec_in, dec_num_pads=dec_pads
            )
            pad_idx = cfg.captioner.pad_idx
        else:
            feats, fpads = store.read_batch([r["img_id"] for r in chunk])
            logits = cap_mod.forward(
                params, cfg, jnp.asarray(feats), dec_in,
                enc_num_pads=jnp.asarray(fpads), dec_num_pads=dec_pads,
            )
            pad_idx = cfg.pad_idx
        loss = label_smoothing_loss(logits, targets, pad_idx)
        total += float(loss) * len(chunk)
        count += len(chunk)
    if store:
        store.close()
    return total / max(count, 1)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluation")
    parser.add_argument("--dataset", choices=["coco", "vizwiz"], default="coco")
    parser.add_argument("--annotations", type=str, required=True)
    parser.add_argument("--images_path", type=str, default="")
    parser.add_argument("--features_path", type=str, default=None,
                        help="HDF5 feature store; when set, evaluates the "
                             "features-in model instead of end-to-end")
    parser.add_argument("--vocab_path", type=str, default=None)
    parser.add_argument("--load_path", type=str, nargs="+", required=True,
                        help="one checkpoint, or several for ensemble decoding")
    parser.add_argument("--split", default="test", choices=["val", "test"])
    parser.add_argument("--beam_sizes", type=int, nargs="+", default=[3])
    parser.add_argument("--metrics", type=str, nargs="+",
                        default=["bleu", "meteor", "rouge", "cider", "spice"],
                        choices=["bleu", "meteor", "rouge", "cider", "spice"],
                        help="scorers to run (the reference's COCOEvalCap runs "
                             "all five by default, eval/eval.py:33-67; METEOR "
                             "and SPICE use the native scorers unless "
                             "METEOR_JAR/SPICE_JAR are set)")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_seq_len", type=int, default=74)
    parser.add_argument("--param_config", type=int, default=0, choices=[0, 1, 2])
    parser.add_argument("--model_dim", type=int, default=512)
    parser.add_argument("--N_enc", type=int, default=3)
    parser.add_argument("--N_dec", type=int, default=3)
    parser.add_argument("--ff", type=int, default=2048)
    parser.add_argument("--num_heads", type=int, default=8)
    parser.add_argument("--num_exp_enc_list", type=int, nargs="+",
                        default=[32, 64, 128, 256, 512])
    parser.add_argument("--num_exp_dec", type=int, default=16)
    parser.add_argument("--img_feature_dim", type=int, default=1536)
    # Swin geometry (defaults = Swin-L/384; overridable for small configs/tests)
    parser.add_argument("--swin_img_size", type=int, default=384)
    parser.add_argument("--swin_patch_size", type=int, default=4)
    parser.add_argument("--swin_embed_dim", type=int, default=192)
    parser.add_argument("--swin_depths", type=int, nargs="+", default=[2, 2, 18, 2])
    parser.add_argument("--swin_num_heads", type=int, nargs="+",
                        default=[6, 12, 24, 48])
    parser.add_argument("--swin_window_size", type=int, default=12)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--quantize", choices=["none", "w8", "w8a8"],
                        default="none")
    parser.add_argument("--load_pruned", action="store_true",
                        help="--load_path points at a sparse .npz written by "
                             "deploy.pruning.save_sparse (reference "
                             "test.py:455-459)")
    parser.add_argument("--eval_loss", action="store_true")
    parser.add_argument("--dump_predictions", type=str, default=None,
                        help="write decoded captions as JSON "
                             "{beam_size: {img_id: caption}} — the artifact "
                             "the reference prints per-image at "
                             "test.py:216-224, made machine-readable so "
                             "configurations can be diffed (fp32 vs bf16 vs "
                             "int8 caption drift)")
    parser.add_argument("--n_model", type=int, default=1,
                        help="tensor-parallel mesh axis size (see cli/train.py)")
    parser.add_argument("--attention_impl",
                        choices=["auto", "xla", "pallas", "fused"],
                        default="auto",
                        help="'fused' runs the Pallas whole-block Swin kernels "
                             "(~2x faster inference); 'xla' keeps the "
                             "reference-exact op order for caption parity; "
                             "'auto' (default) = fused on TPU, xla elsewhere")
    parser.add_argument("--dyn_step_impl", choices=["auto", "xla", "pallas"],
                        default="auto",
                        help="incremental decode step impl; 'auto' (default) "
                             "= pallas on TPU, xla elsewhere")
    args = parser.parse_args(argv)
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from ..config import resolve_kernel_impls

    args.attention_impl, args.dyn_step_impl = resolve_kernel_impls(
        args.attention_impl, args.dyn_step_impl
    )

    from ..config import CaptionerConfig, end_expansionnet_v2_coco, remove_layers
    from ..utils.checkpointing import load_checkpoint
    from .demo import load_params

    dataset = build_dataset(args)
    vocab = dataset.vocab
    cap = CaptionerConfig(
        d_model=args.model_dim, N_enc=args.N_enc, N_dec=args.N_dec, ff=args.ff,
        num_heads=args.num_heads, num_exp_enc_list=tuple(args.num_exp_enc_list),
        num_exp_dec=args.num_exp_dec, vocab_size=len(vocab),
        max_seq_len=args.max_seq_len, img_feature_dim=args.img_feature_dim,
        sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx, pad_idx=vocab.pad_idx,
        unk_idx=vocab.unk_idx,
    )
    if args.features_path:
        cfg = cap  # features-in CaptionerConfig
        if args.param_config:
            cfg = dataclasses.replace(
                cfg,
                N_enc=cfg.N_enc - (args.param_config >= 1),
                N_dec=cfg.N_dec - (args.param_config >= 2),
            )
        if args.load_pruned:
            from ..deploy.pruning import load_sparse
            from ..models.captioner import captioner_init

            template = captioner_init(jax.random.PRNGKey(0), cfg)
            params = [load_sparse(lp, template) for lp in args.load_path]
        else:
            params = [load_checkpoint(lp)["params"] for lp in args.load_path]
        params = params[0] if len(params) == 1 else params
    else:
        from ..config import ModelConfig, SwinConfig

        swin = SwinConfig(
            img_size=args.swin_img_size, patch_size=args.swin_patch_size,
            embed_dim=args.swin_embed_dim, depths=tuple(args.swin_depths),
            num_heads=tuple(args.swin_num_heads),
            window_size=args.swin_window_size,
            attention_impl=args.attention_impl,
        )
        cfg = ModelConfig(
            swin=swin,
            captioner=dataclasses.replace(
                cap, img_feature_dim=swin.num_features
            ),
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        cfg = remove_layers(cfg, args.param_config)
        if args.load_pruned:
            from ..deploy.pruning import load_sparse
            from ..models import end_to_end

            template = end_to_end.init(jax.random.PRNGKey(0), cfg)
            params = [load_sparse(lp, template) for lp in args.load_path]
        else:
            params = [load_params(lp, cfg) for lp in args.load_path]
        params = params[0] if len(params) == 1 else params

    if args.param_config and not args.load_pruned:
        # Full-stack checkpoints get the layer-removal surgery at load time
        # (reference train.py:305-342 slices the reduce_group weight and
        # drops layer idx 1); checkpoints already saved in reduced form pass
        # through untouched.
        from ..params import surgery

        def _apply_surgery(p):
            capp = p["captioner"] if "captioner" in p else p
            if len(capp["encoders"]) == args.N_enc:
                capp = surgery.remove_layer(capp, args.param_config)
            if "captioner" in p:
                return {**p, "captioner": capp}
            return capp

        params = (
            [_apply_surgery(p) for p in params]
            if isinstance(params, list)
            else _apply_surgery(params)
        )

    if args.quantize != "none":
        from ..deploy.quantization import quantize_tree

        if isinstance(params, list):
            params = [quantize_tree(p, args.quantize) for p in params]
        else:
            params = quantize_tree(params, args.quantize)

    # end-to-end trees: pre-expand the Swin rel-pos biases for inference
    # (features-in captioner trees have no "swin" and need no preparation)
    from ..models import end_to_end

    def _prep(p):
        return (
            end_to_end.prepare_inference_params(p, cfg) if "swin" in p else p
        )

    params = [_prep(p) for p in params] if isinstance(params, list) else _prep(params)

    from ..decode.cache import set_dyn_step_impl
    from ..parallel import mesh as pm

    set_dyn_step_impl(args.dyn_step_impl)
    mesh = pm.make_default_mesh(args.batch_size, n_model=args.n_model)
    if mesh.size > 1:
        print(f"SPMD mesh {dict(mesh.shape)} over {mesh.size} devices", flush=True)
    dumped = {}
    for beam in args.beam_sizes:
        print(f"=== beam size {beam} ===", flush=True)
        scores, predictions = evaluate_split(
            params, cfg, dataset, args.split, beam, args.batch_size,
            args.max_seq_len, args.features_path, mesh=mesh,
            metrics=tuple(args.metrics),
        )
        for k, v in scores.items():
            print(f"{k}: {v:.4f}", flush=True)
        dumped[beam] = {str(k): v for k, v in predictions.items()}
    if args.dump_predictions:
        import json

        with open(args.dump_predictions, "w") as f:
            json.dump(dumped, f, indent=1)
        print(f"predictions written to {args.dump_predictions}", flush=True)
    if args.eval_loss:
        loss = compute_evaluation_loss(
            params, cfg, dataset, args.split, args.batch_size, args.features_path
        )
        print(f"eval loss: {loss:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
