"""Feature extraction CLI (reference data_generator.py): run the Swin backbone
over every image of a dataset and write a "{img_id}_features" HDF5 store usable by
the features-in training path.

    python -m on_device_image_captioning_tpu.cli.generate_features \
        --dataset coco --annotations dataset_coco.json --images_path ... \
        --backbone_checkpoint swin.pth --output features.hdf5

Unlike the reference (one image at a time on GPU, data_generator.py:98-160), this
batches images through a jitted forward for MXU utilization.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Feature generation")
    parser.add_argument("--dataset", choices=["coco", "vizwiz"], default="coco")
    parser.add_argument("--annotations", type=str, required=True)
    parser.add_argument("--images_path", type=str, default="")
    parser.add_argument("--vocab_path", type=str, default=None)
    parser.add_argument("--backbone_checkpoint", type=str, default=None,
                        help=".pth (full model, Swin-official, or backbone-only) "
                             "or native checkpoint; random init when omitted")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    parser.add_argument("--swin_img_size", type=int, default=384)
    parser.add_argument("--swin_patch_size", type=int, default=4)
    parser.add_argument("--swin_embed_dim", type=int, default=192)
    parser.add_argument("--swin_depths", type=int, nargs="+", default=[2, 2, 18, 2])
    parser.add_argument("--swin_num_heads", type=int, nargs="+",
                        default=[6, 12, 24, 48])
    parser.add_argument("--swin_window_size", type=int, default=12)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--feature_dtype", choices=["float32", "float16"],
                        default="float32",
                        help="on-disk feature dtype; float16 halves the store "
                             "(the reference's features.hdf5 is 102 GB f32, "
                             "README.md:166-168) and the device->host transfer. "
                             "Readers (data/features_io.py) cast to f32.")
    args = parser.parse_args(argv)
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from ..data.datasets import load_coco_karpathy, load_vizwiz
    from ..data.features_io import FeatureStore
    from ..data.text import Vocab
    from ..models import swin as swin_mod
    from ..utils.image import normalize_on_device, preprocess_batch

    vocab = Vocab.from_json(args.vocab_path) if args.vocab_path else None
    if args.dataset == "coco":
        dataset = load_coco_karpathy(args.annotations, args.images_path, vocab=vocab)
    else:
        dataset = load_vizwiz(args.annotations, args.images_path, vocab=vocab)

    from ..config import SwinConfig

    swin_cfg = SwinConfig(
        img_size=args.swin_img_size, patch_size=args.swin_patch_size,
        embed_dim=args.swin_embed_dim, depths=tuple(args.swin_depths),
        num_heads=tuple(args.swin_num_heads), window_size=args.swin_window_size,
    )
    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.backbone_checkpoint:
        params = _load_backbone(args.backbone_checkpoint, swin_cfg)
    else:
        print("WARNING: random backbone weights (no checkpoint given)", flush=True)
        params = swin_mod.swin_init(jax.random.PRNGKey(0), swin_cfg)
    params = swin_mod.prepare_inference_params(params, swin_cfg)

    store_dtype = np.dtype(args.feature_dtype)

    @jax.jit
    def extract(params, images_u8):
        x = normalize_on_device(images_u8)
        y = swin_mod.swin_apply(params, swin_cfg, x, dtype=compute_dtype)
        # f16 store: cast ON DEVICE so the transfer carries 2-byte elements.
        # f32 store: ship the compute dtype as-is (bf16 under --bf16 — half
        # the bytes) and upcast on the host in _drain.
        return y.astype(jnp.float16) if store_dtype == np.float16 else y

    records = [r for s in args.splits for r in dataset.records(s)]
    print(f"extracting features for {len(records)} images", flush=True)
    t0 = time.time()

    # three-stage software pipeline: a worker thread decodes + resizes the
    # NEXT batch (GIL-releasing PIL C code) while the device computes the
    # CURRENT one and the host drains the PREVIOUS result — jax dispatch is
    # async, so enqueueing batch k+1 before device_get(k) overlaps JPEG
    # decode, H2D, compute, and D2H (the reference extracts one image at a
    # time fully synchronously, data_generator.py:98-160)
    def batches():
        for start in range(0, len(records), args.batch_size):
            chunk = records[start : start + args.batch_size]
            imgs = preprocess_batch(
                [r["img_path"] for r in chunk], swin_cfg.img_size
            )
            pad = args.batch_size - len(chunk)
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
            yield chunk, imgs

    from ..data.prefetch import PrefetchIterator

    it = iter(batches())
    prefetch = PrefetchIterator(
        next_batch=lambda: next(it), materialize=lambda b: b, depth=2
    )
    done = 0
    with FeatureStore(args.output, "w") as store:
        pending = None  # (chunk, device features) still on device
        while True:
            try:
                (chunk, imgs), _ = prefetch.get()
            except StopIteration:
                break
            feats_dev = extract(params, jnp.asarray(imgs))
            if pending is not None:
                _drain(store, pending, store_dtype)
                done += len(pending[0])
                if done % (args.batch_size * 20) == 0:
                    rate = done / max(time.time() - t0, 1e-9)
                    print(f"{done}/{len(records)} ({rate:.1f} img/s)", flush=True)
            pending = (chunk, feats_dev)
        if pending is not None:
            _drain(store, pending, store_dtype)
            done += len(pending[0])
        rate = done / max(time.time() - t0, 1e-9)
        print(f"{done}/{len(records)} ({rate:.1f} img/s)", flush=True)
    prefetch.close()
    return 0


def _drain(store, pending, store_dtype):
    chunk, feats_dev = pending
    feats = np.asarray(feats_dev).astype(store_dtype, copy=False)
    for r, f in zip(chunk, feats):
        store.write(r["img_id"], f)


def _load_backbone(path: str, swin_cfg):
    """Accept a full end-to-end checkpoint, a Swin-official file ({'model': ...},
    reference data_generator.py:76-83), or a native checkpoint."""
    from ..config import ModelConfig, CaptionerConfig
    import dataclasses

    from ..params.torch_convert import convert_end_to_end, convert_swin, to_jax
    from ..utils.checkpointing import load_checkpoint

    if path.endswith(".pth"):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if "model" in sd:  # Swin-official pretraining format
            return to_jax(convert_swin(sd["model"], swin_cfg, prefix=""))
        cfg = ModelConfig(
            swin=swin_cfg,
            captioner=dataclasses.replace(
                CaptionerConfig(), img_feature_dim=swin_cfg.num_features
            ),
        )
        return to_jax(convert_end_to_end(sd, cfg))["swin"]
    payload = load_checkpoint(path)
    params = payload["params"]
    return params["swin"] if "swin" in params else params


if __name__ == "__main__":
    raise SystemExit(main())
