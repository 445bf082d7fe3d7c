"""Training CLI (reference train.py): XE and SCST phases over COCO or VizWiz,
features-in or end-to-end, with resumable checkpoints.

    python -m on_device_image_captioning_tpu.cli.train \
        --dataset coco --annotations dataset_coco.json --images_path ... \
        --save_path ./saves --sched_type custom_warmup_anneal --optim_type radam

Differences from the reference runtime (by design, SURVEY §2.6): no process
spawning or NCCL — data parallelism is SPMD over jax.devices() (batch sharded on
the mesh's 'data' axis; XLA inserts the gradient all-reduce), and the dataloader's
deterministic seeded sharding uses jax.process_index() in multi-host settings.
"""
from __future__ import annotations

import argparse
import dataclasses
import random
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Image Captioning Training")
    # model (reference train.py:647-656)
    p.add_argument("--model_dim", type=int, default=512)
    p.add_argument("--N_enc", type=int, default=3)
    p.add_argument("--N_dec", type=int, default=3)
    p.add_argument("--ff", type=int, default=2048)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--num_exp_enc_list", type=int, nargs="+",
                   default=[32, 64, 128, 256, 512])
    p.add_argument("--num_exp_dec", type=int, default=16)
    p.add_argument("--img_feature_dim", type=int, default=1536)
    p.add_argument("--enc_drop", type=float, default=0.1)
    p.add_argument("--dec_drop", type=float, default=0.1)
    p.add_argument("--enc_input_drop", type=float, default=0.1)
    p.add_argument("--dec_input_drop", type=float, default=0.1)
    p.add_argument("--drop_other", type=float, default=0.1)
    p.add_argument("--param_config", type=int, default=0, choices=[0, 1, 2])
    # optimization (reference train.py:657-669)
    p.add_argument("--optim_type", choices=["adam", "radam", "adamw"],
                   default="adam")
    p.add_argument("--sched_type", choices=["annealing", "custom_warmup_anneal"],
                   default="annealing")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--min_lr", type=float, default=5e-7)
    p.add_argument("--warmup_iters", type=int, default=4000)
    p.add_argument("--anneal_coeff", type=float, default=0.8)
    p.add_argument("--anneal_every_epoch", type=float, default=3.0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_accum", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=5)
    # phases
    p.add_argument("--reinforce", action="store_true")
    p.add_argument("--device_reward", action="store_true",
                   help="compute the SCST CIDEr-D reward ON DEVICE "
                        "(train/device_cider.py): sample + reward + gradient "
                        "run as one jit with no host round trip per "
                        "iteration (the reference syncs every iteration, "
                        "losses/reward.py:30-89); reward parity is tested "
                        "vs the host scorer")
    p.add_argument("--num_samples", type=int, default=5,
                   help="SCST samples per image (reference train.py:146-151)")
    p.add_argument("--scst_max_len", type=int, default=20)
    p.add_argument("--scst_dropout", action="store_true",
                   help="apply dropout/drop-path during the SCST re-score "
                        "forward (an INDEPENDENT draw around the no-dropout "
                        "sampling policy, approximating the reference's "
                        "dropout-active sampling forward, train.py:124-172). "
                        "Default off: the re-score reproduces the sampling "
                        "logprobs exactly, giving the unbiased REINFORCE "
                        "gradient for the policy the captions were actually "
                        "sampled from (see train/train_step.py)")
    # data
    p.add_argument("--dataset", choices=["coco", "vizwiz"], default="coco")
    p.add_argument("--annotations", type=str, required=True)
    p.add_argument("--images_path", type=str, default="")
    p.add_argument("--features_path", type=str, default=None)
    p.add_argument("--preproc_images_hdf5", type=str, default=None,
                   help="preprocessed uint8 image store (data/images_io.py), "
                        "replaces per-step JPEG decode in end-to-end training")
    p.add_argument("--vocab_path", type=str, default=None)
    p.add_argument("--is_end_to_end", action="store_true")
    p.add_argument("--max_seq_len", type=int, default=None)
    # checkpointing (reference train.py:672-690)
    p.add_argument("--save_path", type=str, default="./saves/")
    p.add_argument("--save_every_minutes", type=int, default=25)
    p.add_argument("--how_many_checkpoints", type=int, default=1)
    p.add_argument("--pretrain_checkpoint", type=str, default=None)
    p.add_argument("--backbone_save_path", type=str, default="")
    p.add_argument("--body_save_path", type=str, default="")
    # eval / logging
    p.add_argument("--eval_every_iter", type=int, default=999999)
    p.add_argument("--eval_beam_sizes", type=int, nargs="+", default=[3])
    p.add_argument("--eval_parallel_batch_size", type=int, default=8)
    p.add_argument("--print_every_iter", type=int, default=10)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--bf16", action="store_true")
    # Swin geometry (defaults = Swin-L/384, matching the reference's
    # end-to-end model; overridable for small configs — same surface as the
    # evaluate/generate_features CLIs)
    p.add_argument("--swin_img_size", type=int, default=384)
    p.add_argument("--swin_patch_size", type=int, default=4)
    p.add_argument("--swin_embed_dim", type=int, default=192)
    p.add_argument("--swin_depths", type=int, nargs="+", default=[2, 2, 18, 2])
    p.add_argument("--swin_num_heads", type=int, nargs="+",
                   default=[6, 12, 24, 48])
    p.add_argument("--swin_window_size", type=int, default=12)
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the Swin blocks (the reference's "
                        "swin_use_checkpoint flag)")
    p.add_argument("--metrics_jsonl", type=str, default=None)
    p.add_argument("--swin_attention_impl",
                   choices=["auto", "xla", "pallas", "fused"],
                   default="auto",
                   help="Swin kernel implementation: 'fused' runs the "
                        "whole-block Pallas kernels (ops/swin_block_fused) — "
                        "for SCST sampling and eval hooks, AND for gradient "
                        "forwards on the eligible stages via the training "
                        "custom VJP (requires swin drop/attn_drop = 0, the "
                        "reference recipe; ineligible stages fall back). fp "
                        "reduction order differs slightly between impls. "
                        "'auto' (default) = fused on TPU, xla elsewhere")
    p.add_argument("--dyn_step_impl", choices=["auto", "xla", "pallas"],
                   default="auto",
                   help="incremental decode-step kernel for SCST sampling and "
                        "eval-hook beam search (ops/dyn_exp_step.py); 'auto' "
                        "(default) = pallas on TPU, xla elsewhere")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host SPMD: call jax.distributed.initialize() "
                        "(coordinator from JAX_COORDINATOR_ADDRESS etc.); the "
                        "loader shards by process index automatically")
    p.add_argument("--n_model", type=int, default=1,
                   help="tensor-parallel mesh axis size (Megatron-style "
                        "sharding of FFN/vocab/QKV weights, parallel/mesh.py); "
                        "1 = pure data parallelism like the reference's DDP")
    p.add_argument("--prefetch", type=int, default=0,
                   help="prefetch depth: overlap host batch materialization "
                        "(JPEG decode / HDF5 reads) with device compute; 0 = "
                        "synchronous. Checkpoints store the cursor of the last "
                        "CONSUMED batch, so resume is exact either way")
    return p.parse_args(argv)


def build_model_cfg(args, vocab, max_seq_len):
    from ..config import (
        CaptionerConfig,
        DropConfig,
        end_expansionnet_v2_coco,
        remove_layers,
    )

    drop = DropConfig(
        enc=args.enc_drop, dec=args.dec_drop, enc_input=args.enc_input_drop,
        dec_input=args.dec_input_drop, other=args.drop_other,
    )
    cap = CaptionerConfig(
        d_model=args.model_dim, N_enc=args.N_enc, N_dec=args.N_dec,
        ff=args.ff, num_heads=args.num_heads,
        num_exp_enc_list=tuple(args.num_exp_enc_list),
        num_exp_dec=args.num_exp_dec,
        vocab_size=len(vocab), max_seq_len=max_seq_len, drop=drop,
        sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx, pad_idx=vocab.pad_idx,
        unk_idx=vocab.unk_idx,
        img_feature_dim=args.img_feature_dim,
    )
    if args.is_end_to_end:
        from ..config import SwinConfig

        cfg = end_expansionnet_v2_coco(
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32
        )
        swin = SwinConfig(
            img_size=args.swin_img_size, patch_size=args.swin_patch_size,
            embed_dim=args.swin_embed_dim, depths=tuple(args.swin_depths),
            num_heads=tuple(args.swin_num_heads),
            window_size=args.swin_window_size,
            drop_path_rate=cfg.swin.drop_path_rate,
            attention_impl=getattr(args, "swin_attention_impl", "xla"),
        )
        cfg = dataclasses.replace(
            cfg,
            captioner=dataclasses.replace(
                cap, img_feature_dim=swin.num_features
            ),
            swin=swin,
        )
        return remove_layers(cfg, args.param_config)
    if args.param_config:  # features-in variant of the layer-removal ablations
        cap = dataclasses.replace(
            cap,
            N_enc=cap.N_enc - (args.param_config >= 1),
            N_dec=cap.N_dec - (args.param_config >= 2),
        )
    return cap


def main(argv=None):
    args = parse_args(argv)
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    if args.distributed:
        jax.distributed.initialize()
    random.seed(args.seed)
    np.random.seed(args.seed)
    from ..config import resolve_kernel_impls

    args.swin_attention_impl, args.dyn_step_impl = resolve_kernel_impls(
        args.swin_attention_impl, args.dyn_step_impl
    )
    if args.dyn_step_impl != "xla":
        from ..decode.cache import set_dyn_step_impl

        set_dyn_step_impl(args.dyn_step_impl)

    from ..data.datasets import load_coco_karpathy, load_vizwiz
    from ..data.features_io import FeatureStore
    from ..data.loader import ShardedCaptionLoader
    from ..data.text import Vocab
    from ..models import captioner as cap_mod
    from ..models import end_to_end
    from ..parallel import mesh as pm
    from ..params import surgery
    from ..train import radam as radam_mod
    from ..train import schedules, train_step
    from ..train.scst import CiderReward
    from ..utils import checkpointing as ckpt
    from ..utils.image import normalize_on_device, preprocess_batch
    from .demo import load_params

    # ---- data -------------------------------------------------------------
    vocab = Vocab.from_json(args.vocab_path) if args.vocab_path else None
    if args.dataset == "coco":
        dataset = load_coco_karpathy(args.annotations, args.images_path, vocab=vocab)
    else:
        dataset = load_vizwiz(args.annotations, args.images_path, vocab=vocab)
    vocab = dataset.vocab
    max_seq_len = args.max_seq_len or dataset.max_seq_len
    mode = "image_wise" if args.reinforce else "caption_wise"
    loader = ShardedCaptionLoader(
        dataset,
        array_of_init_seeds=[args.seed + e for e in range(args.num_epochs * 2)],
        batch_size=args.batch_size,
        rank=jax.process_index(),
        num_procs=jax.process_count(),
        mode=mode,
    )
    store = FeatureStore(args.features_path) if args.features_path else None
    img_store = None
    if args.preproc_images_hdf5:
        from ..data.images_io import PreprocessedImageStore

        img_store = PreprocessedImageStore(args.preproc_images_hdf5)

    # ---- model ------------------------------------------------------------
    cfg = build_model_cfg(args, vocab, max_seq_len)
    end2end = args.is_end_to_end
    cap_cfg = cfg.captioner if end2end else cfg
    rng = jax.random.PRNGKey(args.seed)
    if end2end:
        params = end_to_end.init(rng, cfg)
    else:
        params = cap_mod.captioner_init(rng, cfg)

    if args.pretrain_checkpoint:
        loaded = load_params(args.pretrain_checkpoint, cfg if end2end else None)
        if args.param_config and end2end:
            loaded["captioner"] = surgery.remove_layer(
                loaded["captioner"], args.param_config
            )
        params = loaded
    def _subtree(src, name):
        """Checkpoint may hold the full end-to-end tree or just the subtree
        (recipe phases alternate model kinds — reference README.md:117-259:
        phase 5 seeds the features model from the phase-3/4 end-to-end
        checkpoint's body, phase 6 seeds end-to-end from phase 5's)."""
        return src[name] if isinstance(src, dict) and name in src else src

    for partial_path, subtree in [
        (args.backbone_save_path, "swin"),
        (args.body_save_path, "captioner"),
    ]:
        if partial_path and end2end:
            src = load_params(partial_path, cfg)
            params = surgery.partially_load(
                params, {subtree: _subtree(src, subtree)}
            )
    if args.body_save_path and not end2end:
        # features-model run warm-started from a checkpoint (possibly the
        # end-to-end tree: take its captioner)
        params = _subtree(load_params(args.body_save_path, None), "captioner")

    # ---- optimizer --------------------------------------------------------
    import optax

    num_batches = loader.get_num_batches()
    if args.sched_type == "annealing":
        sched = schedules.annealing(
            args.lr, args.warmup_iters, args.anneal_every_epoch, num_batches,
            args.anneal_coeff,
        )
    else:
        sched = schedules.custom_warmup_anneal(
            args.lr, args.warmup_iters, args.min_lr, args.anneal_coeff,
            args.anneal_every_epoch, num_batches,
        )
    if args.optim_type == "radam":
        base_opt = radam_mod.radam(sched, b1=0.9, b2=0.98, eps=1e-9)
    elif args.optim_type == "adamw":
        base_opt = optax.adamw(sched)  # reference optims/radam.py:240-319
    else:
        base_opt = optax.adam(sched)
    opt = train_step.with_grad_accum(base_opt, args.num_accum)
    state = train_step.init_train_state(params, opt)

    # resume (reference train.py:530-560 + utils/saving_utils.py). Guarded
    # transition: when the phase flips XE<->RF or the batch size changed, keep
    # only the weights and reset optimizer + data cursor
    # (reference train.py:554-597).
    from flax import serialization

    phase = "rf" if args.reinforce else "xe"
    payload, info = ckpt.load_most_recent(args.save_path, verbose=True)
    if payload is not None and (
        jax.tree_util.tree_structure(payload["params"])
        != jax.tree_util.tree_structure(state.params)
    ):
        # recipe phases alternate features-only and end-to-end models in one
        # save dir (reference README.md:117-259); a checkpoint from the other
        # model kind can't seed this one — keep the warm-started weights
        # (--backbone_save_path/--body_save_path handle the cross-phase
        # handoff, reference train.py:554-597)
        print(
            "most recent checkpoint holds a different model tree "
            "(features-only vs end-to-end); starting from warm-start/init "
            "weights instead",
            flush=True,
        )
        payload = None
    if payload is not None:
        restored_params = payload["params"]  # relistified natural pytree
        same_phase = info == phase
        same_bs = (
            payload.get("data_loader_state", {}) or {}
        ).get("batch_size") == args.batch_size
        if same_phase and same_bs:
            opt_state = serialization.from_state_dict(
                state.opt_state, payload["opt_state"]
            )
            state = train_step.TrainState(
                restored_params, opt_state, jnp.int32(payload["step"])
            )
            if payload.get("data_loader_state"):
                loader.load_state(payload["data_loader_state"])
        else:
            print(
                f"phase/batch-size change ({info}->{phase}): keeping weights, "
                "resetting optimizer and data cursor",
                flush=True,
            )
            state = train_step.init_train_state(restored_params, opt)

    # ---- SPMD placement (replaces the reference's mp.spawn + DDP,
    # train.py:616-643, :450): batch sharded on the mesh 'data' axis, weights
    # replicated (or TP-sharded with --n_model>1); XLA inserts the gradient
    # all-reduce over ICI.
    mesh = pm.make_default_mesh(args.batch_size, n_model=args.n_model)
    state = pm.shard_train_state(state, mesh)
    if mesh.size > 1:
        print(f"SPMD mesh {dict(mesh.shape)} over {mesh.size} devices", flush=True)

    # ---- steps ------------------------------------------------------------
    xe_step = jax.jit(
        train_step.make_xe_step(cfg, opt, end_to_end_model=end2end,
                                remat=args.remat)
    )
    if args.reinforce:
        if args.scst_max_len > args.max_seq_len:
            # the decoder's learned positional table has max_seq_len rows;
            # sampling past it would silently clamp positions and the
            # teacher-forced re-score would fail on a shape mismatch
            raise SystemExit(
                f"--scst_max_len {args.scst_max_len} exceeds --max_seq_len "
                f"{args.max_seq_len} (the decoder's positional-embedding "
                f"budget); lower scst_max_len or raise max_seq_len"
            )
        train_records = dataset.records("train")
        if args.device_reward:
            from ..train.device_cider import DeviceCiderCorpus

            dcorpus = DeviceCiderCorpus(
                [r["captions"] for r in train_records], vocab
            )
            # shared-forward fused step: encoder runs ONCE (vjp), sampling +
            # device CIDEr + REINFORCE grad all in one jit. remat threads
            # into the re-score encoder exactly as in the XE step — without
            # it the full-size SCST e2e backward needs ~30 GB of stage-2
            # activation saves (caught by the recipe rehearsal's phase-6 OOM)
            scst_fused = jax.jit(
                train_step.make_scst_fused_step(
                    cfg, opt, end_to_end_model=end2end,
                    num_samples=args.num_samples,
                    scst_max_len=args.scst_max_len,
                    sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx,
                    reward_fn=dcorpus.make_reward_fn(), remat=args.remat,
                    dropout=args.scst_dropout,
                )
            )
        else:
            # host-reward path: sample jit -> host CIDEr -> grad jit
            scst_inner = train_step.make_scst_step(
                cfg, opt, end_to_end_model=end2end,
                num_samples=args.num_samples, remat=args.remat,
            )
            scst_step = jax.jit(scst_inner)
            reward_fn = CiderReward([r["captions"] for r in train_records])

            from ..decode import sampling

            def _sample(params, enc_input, rng, enc_num_pads=None):
                if end2end:
                    enc = end_to_end.forward_enc(params, cfg, enc_input)
                else:
                    enc = cap_mod.forward_enc(
                        params, cfg, enc_input, enc_num_pads=enc_num_pads
                    )
                return sampling.sample(
                    params["captioner"] if end2end else params, cap_cfg, enc,
                    args.num_samples, args.scst_max_len, rng,
                    vocab.sos_idx, vocab.eos_idx,
                    enc_num_pads=enc_num_pads,
                )

            sample_batch = jax.jit(_sample)

    def materialize_enc_input(batch):
        """-> (enc_input, enc_num_pads or None)."""
        if end2end:
            if img_store is not None:
                imgs = img_store.read_batch(loader.image_ids(batch["img_idxs"]))
            else:
                imgs = preprocess_batch(
                    loader.image_paths(batch["img_idxs"]), cfg.swin.img_size
                )
            return normalize_on_device(jnp.asarray(imgs)), None
        feats, pads = store.read_batch(loader.image_ids(batch["img_idxs"]))
        return jnp.asarray(feats), jnp.asarray(pads, jnp.int32)

    # ---- loop (reference train.py:47-302) ---------------------------------
    from ..utils.profiling import MetricsLogger, StepTimer

    total_iters = args.num_epochs * num_batches
    start_iter = int(state.step)
    last_save = time.time()
    running = []
    timer = StepTimer(warmup=2)
    logger = MetricsLogger(args.metrics_jsonl, stdout=False)
    step_rng = jax.random.PRNGKey(args.seed + 1)
    print(
        f"training: {total_iters} iters ({num_batches}/epoch), "
        f"{'end-to-end' if end2end else 'features'}, "
        f"{'SCST' if args.reinforce else 'XE'}",
        flush=True,
    )
    def materialize(batch):
        enc_input, enc_pads = materialize_enc_input(batch)
        arrays = {"enc_input": enc_input}
        if enc_pads is not None:
            arrays["enc_num_pads"] = enc_pads
        if "captions" in batch:
            arrays["captions"] = jnp.asarray(batch["captions"], jnp.int32)
        return pm.shard_batch(arrays, mesh)

    prefetcher = None
    if args.prefetch > 0:
        from ..data.prefetch import PrefetchIterator

        prefetcher = PrefetchIterator(
            lambda: loader.get_next_batch(max_seq_len), materialize,
            depth=args.prefetch, snapshot=loader.save_state,
        )

    for it in range(start_iter, total_iters):
        if prefetcher is not None:
            batch, arrays = prefetcher.get()
        else:
            batch = loader.get_next_batch(max_seq_len)
            arrays = materialize(batch)
        step_rng, sub = jax.random.split(step_rng)
        if not args.reinforce:
            state, metrics = xe_step(state, arrays, sub)
            running.append(float(metrics["loss"]))
        elif args.device_reward:
            # one jit per iteration: sample + device CIDEr + REINFORCE grad;
            # the only host work is gathering this batch's reference tables
            # (a numpy fancy-index over precomputed arrays)
            ref_tables = pm.shard_batch(
                {
                    k: jnp.asarray(v)
                    for k, v in dcorpus.batch(batch["img_idxs"]).items()
                },
                mesh,
            )
            state, metrics = scst_fused(state, arrays, ref_tables, sub)
            running.append(float(metrics["reward"]))
        else:
            sampled = sample_batch(
                state.params, arrays["enc_input"], sub,
                enc_num_pads=arrays.get("enc_num_pads"),
            )
            # rewards are computed rank-locally: this process's rows of the
            # sampled tokens align with its loader shard (batch["img_idxs"])
            rewards = reward_fn(
                pm.local_rows(sampled.tokens), pm.local_rows(sampled.lengths),
                batch["img_idxs"], vocab,
            )
            step_rng, sub2 = jax.random.split(step_rng)
            state, metrics = scst_step(
                state, arrays,
                {"tokens": sampled.tokens, "lengths": sampled.lengths},
                pm.shard_batch(jnp.asarray(rewards), mesh),
                sub2 if args.scst_dropout else None,
            )
            running.append(float(metrics["reward"]))

        timer.tick()
        if (it + 1) % args.print_every_iter == 0:
            tag = "reward" if args.reinforce else "loss"
            # the schedule counts APPLIED updates, which under MultiSteps
            # advance once per num_accum micro-steps
            stats = {
                tag: float(np.mean(running)),
                "lr": float(sched((it + 1) // max(args.num_accum, 1))),
                "sec_per_iter": timer.sec_per_iter,
                "pct_done": 100.0 * (it + 1) / total_iters,
            }
            print(
                f"it {it + 1}/{total_iters} epoch {loader.get_epoch_it()} "
                f"{tag} {stats[tag]:.4f} lr {stats['lr']:.3e} "
                f"{stats['sec_per_iter']:.3f}s/it {stats['pct_done']:.1f}%",
                flush=True,
            )
            logger.log(it + 1, stats)
            running = []

        if (time.time() - last_save) / 60 >= args.save_every_minutes or (
            it + 1
        ) == total_iters:
            # host_copy is a COLLECTIVE under multi-process (allgather of
            # sharded leaves) — every rank must participate, then rank 0 writes
            params_h = pm.host_copy(state.params)
            opt_h = pm.host_copy(state.opt_state)
            if jax.process_index() == 0:
                # with prefetch, the loader cursor runs ahead of consumption;
                # the prefetcher snapshots the cursor per consumed batch so a
                # resume replays the exact next batch (reference
                # data/transparent_data_loader.py:49-61 semantics)
                dls = (
                    prefetcher.consumed_state
                    if prefetcher is not None
                    else loader.save_state()
                )
                ckpt.save_checkpoint(
                    args.save_path, params_h, opt_h, int(state.step),
                    data_loader_state=dls,
                    additional_info="rf" if args.reinforce else "xe",
                    num_max_checkpoints=args.how_many_checkpoints,
                    epoch_it=dls["epoch_it"],
                    batch_it=dls["batch_it"],
                    batch_size=dls["batch_size"],
                    verbose=True,
                )
            last_save = time.time()

        if (it + 1) % args.eval_every_iter == 0:
            from .evaluate import evaluate_split

            # the eval batch need not divide like the train batch does, so it
            # gets its own mesh (params reshard once per eval pass)
            eval_mesh = pm.make_default_mesh(
                args.eval_parallel_batch_size, n_model=args.n_model
            )
            for beam in args.eval_beam_sizes:
                scores, _ = evaluate_split(
                    state.params, cfg, dataset, "val", beam,
                    args.eval_parallel_batch_size, max_seq_len,
                    args.features_path, mesh=eval_mesh,
                )
                print(f"[eval beam {beam}] {scores}", flush=True)

    if prefetcher is not None:
        prefetcher.close()
    if store:
        store.close()
    if img_store:
        img_store.close()
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
