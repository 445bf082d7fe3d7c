"""VizWiz path end-to-end (VERDICT r4 item 5): render the synthetic shapes
corpus into the VizWiz folder/annotation layout and drive
`cli/train.py --dataset vizwiz` -> `cli/evaluate.py --dataset vizwiz` once,
exercising the filtering / vocab-reuse / truncation path the reference
ships (reference data/vizwiz_dataset.py:236-247 quality-sentinel filtering,
:146-155 COCO-vocab reuse, :79-101 truncation) — these are unit-tested here
but had never been exercised by a real train->eval run.

Layout produced (reference data/vizwiz_dataloader.py:244-261):
    {data}/annotations/{train,val}.json   COCO-caption style images+annotations
    {data}/images/{train,val}/*.jpg
Quality-sentinel captions are sprinkled in (some images get the sentinel
among their five captions -> the whole image must be dropped under the
strict filter), and a few captions exceed max_seq_len to exercise
EOS-preserving truncation.

    python scripts/vizwiz_e2e.py [--tiny] [--epochs 6]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import converge_synthetic as cs  # noqa: E402

PKG = "on_device_image_captioning_tpu"
SENTINEL = "Quality issues are too severe to recognize visual content."


def make_vizwiz_data(data_dir, n_train, n_val, size, vocab_words,
                     sentinel_every=9, long_every=7):
    """Synthetic shapes rendered into the VizWiz layout; returns
    (annotations_dir, images_dir, vocab_path, expected_counts)."""
    import numpy as np
    from PIL import Image

    ann_dir = os.path.join(data_dir, "annotations")
    img_root = os.path.join(data_dir, "images")
    os.makedirs(ann_dir, exist_ok=True)
    rng = np.random.default_rng(20260821)
    colors, shapes = list(cs.COLORS), list(cs.SHAPES)
    positions, bgs = list(cs.POSITIONS), list(cs.BGS)
    expected = {}
    t0 = time.time()
    words_used = set()
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(img_root, split)
        os.makedirs(img_dir, exist_ok=True)
        images, annotations = [], []
        kept = 0
        ann_id = 0
        for i in range(n):
            color = colors[rng.integers(len(colors))]
            shape = shapes[rng.integers(len(shapes))]
            pos = positions[rng.integers(len(positions))]
            bg = bgs[rng.integers(len(bgs))]
            fname = f"VizWiz_{split}_{i:08d}.jpg"
            path = os.path.join(img_dir, fname)
            if not os.path.exists(path):
                Image.fromarray(
                    cs.render(rng, size, color, shape, pos, bg)
                ).save(path, quality=88)
            caps = [
                t.format(color=color, shape=shape, pos=pos, bg=bg)
                for t in cs.TEMPLATES
            ]
            if i % long_every == 3:
                # over-length caption -> encode_caption_truncated keeps EOS
                caps[1] = caps[1] + " and the scene stays otherwise " + \
                    " ".join(["plain"] * 20)
            has_sentinel = i % sentinel_every == 4
            if has_sentinel:
                caps[rng.integers(len(caps))] = SENTINEL
            else:
                kept += 1
            for c in caps:
                words_used.update(c.lower().replace(".", " ").split())
            images.append({"id": i, "file_name": fname})
            for c in caps:
                annotations.append(
                    {"id": ann_id, "image_id": i, "caption": c}
                )
                ann_id += 1
        with open(os.path.join(ann_dir, f"{split}.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)
        expected[split] = {"total": n, "kept_strict": kept}

    # COCO-vocab reuse: the reference trains VizWiz with the COCO vocabulary
    # (data/vizwiz_dataset.py:146-155); build a COCO-style full-size vocab
    # that contains the caption words + fillers
    words_used.update({"PAD", "SOS", "EOS", "UNK"})
    k = 0
    while len(words_used) < vocab_words:
        words_used.add(f"fill{k:05d}")
        k += 1
    vocab_path = os.path.join(data_dir, "coco_reused_vocab.json")
    with open(vocab_path, "w") as f:
        json.dump({w: i for i, w in enumerate(sorted(words_used))}, f)
    print(f"vizwiz data: {n_train}+{n_val} JPEGs in {time.time()-t0:.1f}s; "
          f"expected strict-filter keeps {expected}", flush=True)
    return ann_dir, img_root, vocab_path, expected


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/vizwiz_data")
    ap.add_argument("--saves", default="/tmp/vizwiz_saves")
    ap.add_argument("--train", type=int, default=200)
    ap.add_argument("--val", type=int, default=60)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--tiny", action="store_true")
    a = ap.parse_args()

    cs.FORCE_CPU = a.tiny
    vocab_words, img_size = cs.VOCAB_WORDS, 384
    swin, cap = cs.SWIN_S, cs.CAP_FULL
    if a.tiny:
        vocab_words, img_size = 120, 64
        a.train, a.val, a.epochs = 12, 6, 1
        swin, cap = cs.TINY_SWIN, cs.TINY_CAP

    ann_dir, img_root, vocab_path, expected = make_vizwiz_data(
        a.data, a.train, a.val, img_size, vocab_words
    )

    # the loader-level sentinel/vocab/truncation contract, asserted here so
    # the e2e run is also a correctness check, not just "runs green"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from on_device_image_captioning_tpu.data.datasets import load_vizwiz
    from on_device_image_captioning_tpu.data.text import Vocab

    ds = load_vizwiz(ann_dir, img_root, vocab=Vocab.from_json(vocab_path))
    for split in ("train", "val"):
        got = len(ds.records(split))
        want = expected[split]["kept_strict"]
        assert got == want, (split, got, want)
        assert all(
            SENTINEL not in r["captions"] for r in ds.records(split)
        )
    print(f"strict filter verified: train {len(ds.records('train'))}/"
          f"{expected['train']['total']}, val {len(ds.records('val'))}/"
          f"{expected['val']['total']} kept; sentinel absent", flush=True)

    common = [
        "--dataset", "vizwiz", "--annotations", ann_dir,
        "--images_path", img_root, "--vocab_path", vocab_path,
        *swin, *cap,
    ]
    xe = os.path.join(a.saves, "xe")
    _, xe_s = cs.run("vizwiz_xe", [
        f"{PKG}.cli.train", *common,
        "--is_end_to_end", "--save_path", xe + "/",
        "--max_seq_len", cs.MAX_SEQ_LEN,
        "--seed", "775535", "--optim_type", "radam",
        "--sched_type", "custom_warmup_anneal",
        "--warmup_iters", "50", "--lr", "2e-4",
        "--anneal_coeff", "0.8", "--anneal_every_epoch", "5",
        "--batch_size", "8" if a.tiny else "32", "--num_accum", "1",
        "--num_epochs", str(a.epochs),
        "--eval_every_iter", "999999",
        "--save_every_minutes", "20", "--how_many_checkpoints", "1",
        "--print_every_iter", "10",
        *([] if a.tiny else ["--bf16", "--prefetch", "2"]),
    ])
    log, ev_s = cs.run("vizwiz_eval", [
        f"{PKG}.cli.evaluate", *common,
        "--split", "val", "--beam_sizes", "3",
        "--max_seq_len", cs.MAX_SEQ_LEN, "--batch_size", "32",
        "--metrics", "bleu", "meteor", "rouge", "cider", "spice",
        "--load_path", cs.latest(xe),
        *([] if a.tiny else ["--bf16"]),
    ])
    scores = cs.parse_scores(log)
    report = {
        "expected": expected, "scores": scores,
        "xe_s": round(xe_s, 1), "eval_s": round(ev_s, 1),
        "epochs": a.epochs,
    }
    out = os.path.join(REPO, "artifacts", "vizwiz_e2e.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("vizwiz e2e report:", json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
