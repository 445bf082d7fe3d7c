"""One-command reproduction of the reference's headline numbers.

Given the released rf_model.pth and the Karpathy split data (neither ships in
this environment's snapshot), this evaluates the Karpathy test split end-to-end
and prints the metric table next to the reference's published values
(reference README.md:98-106: B@1 82.8, B@4 41.5, METEOR 30.3, ROUGE-L 60.5,
CIDEr-D 140.4, SPICE 24.5 for the single model).

    python scripts/reproduce_karpathy.py \
        --checkpoint rf_model.pth \
        --annotations dataset_coco.json \
        --images_path /data/MS_COCO_2014/ \
        [--vocab vocab/coco_vocab_idx_dict.json] [--beam_size 5] [--batch 16]

Pass several checkpoints for the ensemble row (B@1 83.5 / CIDEr 143.7).
"""
from __future__ import annotations

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", nargs="+", required=True)
    p.add_argument("--annotations", required=True)
    p.add_argument("--images_path", default="")
    p.add_argument("--vocab", default=None)
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (fp32 default for exactness)")
    args = p.parse_args()

    import jax.numpy as jnp

    from on_device_image_captioning_tpu.cli.demo import load_params
    from on_device_image_captioning_tpu.cli.evaluate import evaluate_split
    from on_device_image_captioning_tpu.config import end_expansionnet_v2_coco
    from on_device_image_captioning_tpu.data.datasets import load_coco_karpathy
    from on_device_image_captioning_tpu.data.text import Vocab
    from on_device_image_captioning_tpu.deploy.reference_results import (
        KARPATHY_TEST_ENSEMBLE,
        KARPATHY_TEST_SINGLE,
        scores_table,
    )

    import dataclasses

    vocab = Vocab.from_json(args.vocab) if args.vocab else None
    dataset = load_coco_karpathy(args.annotations, args.images_path, vocab=vocab)
    vocab = dataset.vocab
    cfg = end_expansionnet_v2_coco(
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    cfg = dataclasses.replace(
        cfg,
        captioner=dataclasses.replace(
            cfg.captioner, vocab_size=len(vocab), sos_idx=vocab.sos_idx,
            eos_idx=vocab.eos_idx, pad_idx=vocab.pad_idx, unk_idx=vocab.unk_idx,
        ),
    )
    params = [load_params(c, cfg) for c in args.checkpoint]
    params = params[0] if len(params) == 1 else params

    scores, _ = evaluate_split(
        params, cfg, dataset, args.split, args.beam_size, args.batch,
        cfg.captioner.max_seq_len,
    )
    reference = (
        KARPATHY_TEST_SINGLE if len(args.checkpoint) == 1 else KARPATHY_TEST_ENSEMBLE
    )
    print()
    print(f"Karpathy {args.split} split, beam {args.beam_size}, "
          f"{len(args.checkpoint)} model(s):")
    print(scores_table(scores, reference))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
