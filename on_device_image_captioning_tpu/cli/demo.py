"""Single-image captioning demo (reference demo.py).

Loads the Swin-L/384 end-to-end model from a reference .pth checkpoint or this
framework's native checkpoint, preprocesses the given images, runs jitted
beam search, and prints one caption per image.

    python -m on_device_image_captioning_tpu.cli.demo \
        --load_path rf_model.pth --image_paths a.jpg b.jpg --beam_size 5
"""
from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def build_vocab(args):
    from ..data.text import Vocab

    if args.vocab_path and args.vocab_path.endswith(".json"):
        return Vocab.from_json(args.vocab_path)
    if args.vocab_path and args.vocab_path.endswith(".pickle"):
        # reference demo_material/demo_coco_tokens.pickle format (demo.py:57-63)
        with open(args.vocab_path, "rb") as f:
            toks = pickle.load(f)
        return Vocab(word2idx=toks["word2idx_dict"])
    raise ValueError("--vocab_path must be a .json vocab or the demo pickle")


def load_params(path: str, cfg):
    from ..params.torch_convert import convert_end_to_end, to_jax
    from ..utils.checkpointing import load_checkpoint

    if path.endswith(".pth"):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        return to_jax(convert_end_to_end(sd, cfg))
    return load_checkpoint(path)["params"]


def main(argv=None):
    parser = argparse.ArgumentParser(description="Demo")
    parser.add_argument("--model_dim", type=int, default=512)
    parser.add_argument("--N_enc", type=int, default=3)
    parser.add_argument("--N_dec", type=int, default=3)
    parser.add_argument("--max_seq_len", type=int, default=74)
    parser.add_argument("--load_path", type=str, required=True)
    parser.add_argument("--vocab_path", type=str, required=True)
    parser.add_argument("--image_paths", type=str, nargs="+", required=True)
    parser.add_argument("--beam_size", type=int, default=5)
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    args = parser.parse_args(argv)
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import dataclasses

    from ..config import DecodeConfig, end_expansionnet_v2_coco
    from ..decode import beam_search as bs
    from ..models import end_to_end
    from ..utils.image import normalize_on_device, preprocess_batch

    vocab = build_vocab(args)
    cfg = end_expansionnet_v2_coco(
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    cfg = dataclasses.replace(
        cfg,
        captioner=dataclasses.replace(
            cfg.captioner,
            d_model=args.model_dim,
            N_enc=args.N_enc,
            N_dec=args.N_dec,
            vocab_size=len(vocab),
            max_seq_len=args.max_seq_len,
            sos_idx=vocab.sos_idx,
            eos_idx=vocab.eos_idx,
            pad_idx=vocab.pad_idx,
            unk_idx=vocab.unk_idx,
        ),
    )
    params = load_params(args.load_path, cfg)
    params = end_to_end.prepare_inference_params(params, cfg)
    print("Model loaded ...", flush=True)

    dcfg = DecodeConfig(
        beam_size=args.beam_size,
        how_many_outputs=1,
        max_seq_len=args.max_seq_len,
        sos_idx=vocab.sos_idx,
        eos_idx=vocab.eos_idx,
    )

    @jax.jit
    def caption_batch(params, images_u8):
        x = normalize_on_device(images_u8)
        enc = end_to_end.forward_enc(params, cfg, x)
        return bs.beam_search(
            params["captioner"], cfg.captioner, enc, dcfg,
            dtype=cfg.compute_dtype,
        )

    images = jnp.asarray(preprocess_batch(args.image_paths, cfg.swin.img_size))
    res = caption_batch(params, images)
    caps, _ = bs.captions_from_result(res)
    for path, row in zip(args.image_paths, caps):
        text = vocab.description(row[0])
        print(f"{os.path.basename(path)}: {text}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
