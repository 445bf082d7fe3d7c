"""Quantization CLI (reference quantization.py): quantize a checkpoint's encoder
and/or decoder half to int8, save the quantized checkpoint, and smoke-caption
demo images for a visual sanity check (the reference prints a demo caption after
conversion, quantization.py:125-140).

    python -m on_device_image_captioning_tpu.cli.quantize \
        --load_path rf_model.pth --vocab_path vocab.json --output q_model.ckpt \
        --scheme w8 --halves encoder decoder [--image_paths demo.jpg]

Evaluation of quantized checkpoints (reference quantization_eval.py) goes through
the standard evaluate CLI with --quantize, or by pointing it at the checkpoint
this writes.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser(description="Quantization")
    parser.add_argument("--load_path", type=str, required=True)
    parser.add_argument("--vocab_path", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--scheme", choices=["w8", "w8a8"], default="w8")
    parser.add_argument("--halves", nargs="+", default=["encoder", "decoder"],
                        choices=["encoder", "decoder"])
    parser.add_argument("--image_paths", type=str, nargs="*", default=[])
    parser.add_argument("--beam_size", type=int, default=5)
    parser.add_argument("--max_seq_len", type=int, default=74)
    args = parser.parse_args(argv)
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import dataclasses

    from ..config import end_expansionnet_v2_coco
    from ..deploy.quantization import (
        quantize_decoder,
        quantize_encoder,
        quantized_size_bytes,
    )
    from .demo import build_vocab, load_params

    vocab = build_vocab(args)
    cfg = end_expansionnet_v2_coco()
    cfg = dataclasses.replace(
        cfg,
        captioner=dataclasses.replace(
            cfg.captioner, vocab_size=len(vocab), max_seq_len=args.max_seq_len,
            sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx, pad_idx=vocab.pad_idx,
            unk_idx=vocab.unk_idx,
        ),
    )
    params = load_params(args.load_path, cfg)
    before = quantized_size_bytes(params)
    if "encoder" in args.halves:
        params = quantize_encoder(params, args.scheme)
    if "decoder" in args.halves:
        params = quantize_decoder(params, args.scheme)
    after = quantized_size_bytes(params)
    print(
        f"quantized ({args.scheme}, halves={args.halves}): "
        f"{before / 1e6:.1f} MB -> {after / 1e6:.1f} MB",
        flush=True,
    )
    from flax import serialization

    import numpy as np

    with open(args.output, "wb") as f:
        f.write(
            serialization.msgpack_serialize(
                {"params": serialization.to_state_dict(
                    jax.tree.map(np.asarray, params))}
            )
        )
    print(f"saved {args.output}", flush=True)

    if args.image_paths:
        from ..config import DecodeConfig
        from ..decode import beam_search as bs
        from ..models import end_to_end
        from ..utils.image import normalize_on_device, preprocess_batch

        dcfg = DecodeConfig(
            beam_size=args.beam_size, how_many_outputs=1,
            max_seq_len=args.max_seq_len, sos_idx=vocab.sos_idx,
            eos_idx=vocab.eos_idx,
        )

        @jax.jit
        def caption(params, images_u8):
            x = normalize_on_device(images_u8)
            enc = end_to_end.forward_enc(params, cfg, x)
            return bs.beam_search(params["captioner"], cfg.captioner, enc, dcfg)

        imgs = jnp.asarray(preprocess_batch(args.image_paths, cfg.swin.img_size))
        caps, _ = bs.captions_from_result(caption(params, imgs))
        for p, row in zip(args.image_paths, caps):
            print(f"{p}: {vocab.description(row[0])}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
