"""Full-size recipe rehearsal on synthetic COCO-format data (VERDICT r2
item 7): drive the six-phase training recipe (scripts/six_phase_recipe.sh,
mirroring reference README.md:117-259) END TO END on the real chip at full
model scale — Swin-L/384, full 10k vocabulary, 384x384 JPEGs — with bounded
per-phase iteration counts, proving phase transitions, cross-phase checkpoint
handoffs, resume, prefetch, and eval hooks outside pytest.

Synthetic data: N_TRAIN images whose 5 captions cycle through 10,000 distinct
words so the min-occurrence-5 vocabulary builder yields the full vocab size;
smooth-gradient JPEGs keep disk/io sane while exercising the real decode and
preprocessing path.

    python scripts/rehearse_recipe.py [--data DIR] [--saves DIR] [--train N]

Writes a per-phase wall-clock/throughput report to stdout; artifacts land in
--saves/p{2,3,5,6} and --data.
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB_WORDS = 10_000
CAP_LEN = 11
CAPS_PER_IMG = 5
IMG_SIZE = 384

# --tiny: CPU smoke of the DRIVER (data gen, phase sequencing, cross-phase
# checkpoint handoffs) with a small model — validates the rehearsal logic
# before spending hours of tunnel-TPU compile time on the full-size run
TINY_SWIN = ["--swin_img_size", "64", "--swin_patch_size", "4",
             "--swin_embed_dim", "16", "--swin_depths", "1", "1",
             "--swin_num_heads", "2", "4", "--swin_window_size", "4"]
TINY_CAP = ["--model_dim", "32", "--N_enc", "1", "--N_dec", "1",
            "--ff", "64", "--num_heads", "4", "--num_exp_enc_list", "4",
            "--num_exp_dec", "4"]


def make_data(data_dir: str, n_train: int, n_val: int, n_test: int):
    import numpy as np
    from PIL import Image

    img_dir = os.path.join(data_dir, "MS_COCO_2014", "coco", "img")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    total = n_train + n_val + n_test
    word_counter = 0

    def next_caption():
        nonlocal word_counter
        words = [
            f"w{(word_counter + k) % VOCAB_WORDS:05d}" for k in range(CAP_LEN)
        ]
        word_counter += CAP_LEN
        return " ".join(words)

    items = []
    t0 = time.time()
    for i in range(total):
        split = (
            "train" if i < n_train
            else "val" if i < n_train + n_val
            else "test"
        )
        fname = f"synthetic_{i:06d}.jpg"
        path = os.path.join(img_dir, fname)
        if not os.path.exists(path):
            # smooth per-image gradient + low-freq noise: honest JPEG decode
            # work without noise-image file sizes
            sz = IMG_SIZE
            yy, xx = np.mgrid[0:sz, 0:sz].astype(np.float32) / sz
            a, b, c = rng.uniform(0, 255, 3)
            img = np.stack(
                [a * yy, b * xx, c * (1 - yy * xx)], axis=-1
            ) + rng.normal(0, 8, (sz, sz, 3))
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                path, quality=80
            )
        items.append({
            "cocoid": i,
            "filepath": "coco",
            "filename": fname,
            "split": split,
            "sentences": [
                {"raw": next_caption()} for _ in range(CAPS_PER_IMG)
            ],
        })
    with open(os.path.join(data_dir, "dataset_coco.json"), "w") as f:
        json.dump({"images": items}, f)
    need = 5 * VOCAB_WORDS
    have = n_train * CAPS_PER_IMG * CAP_LEN
    assert VOCAB_WORDS < 10_000 or have >= need, (
        f"train captions carry {have} word slots; need >= {need} for the "
        f"full {VOCAB_WORDS}-word min-occ-5 vocabulary (raise --train)"
    )
    print(f"data: {total} JPEGs + dataset_coco.json in {time.time()-t0:.1f}s",
          flush=True)


FORCE_CPU = False


def run(tag, args_list, env=None):
    t0 = time.time()
    e = dict(os.environ)
    if env:
        e.update(env)
    if FORCE_CPU:
        # the axon TPU plugin ignores JAX_PLATFORMS=cpu from the environment;
        # only jax.config.update BEFORE backend init pins the platform, so the
        # tiny smoke launches the CLI through a shim (a tunnel compile per
        # tiny phase would be minutes each — and killing in-flight tunnel
        # clients wedges the device)
        import json as _json

        mod, argv = args_list[0], args_list[1:]
        code = (
            "import sys, json, runpy, jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            f"sys.argv = ['python'] + json.loads({_json.dumps(_json.dumps(argv))})\n"
            f"runpy.run_module({mod!r}, run_name='__main__')\n"
        )
        cmd = [sys.executable, "-c", code]
    else:
        cmd = [sys.executable, "-m"] + args_list
    proc = subprocess.run(
        cmd, cwd=REPO, env=e,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    dt = time.time() - t0
    full = os.path.join("/tmp", f"rehearsal_{tag.split()[0]}.log")
    with open(full, "w") as f:
        f.write(proc.stdout)
    tail = "\n".join(proc.stdout.strip().splitlines()[-12:])
    print(f"--- {tag}: rc={proc.returncode} in {dt:.1f}s "
          f"(full log: {full}) ---\n{tail}\n", flush=True)
    if proc.returncode != 0:
        raise SystemExit(f"{tag} failed (rc={proc.returncode})")
    return dt


def latest(d):
    cs = sorted(
        (os.path.join(d, f) for f in os.listdir(d) if f.startswith("checkpoint_")),
        key=os.path.getmtime,
    )
    assert cs, f"no checkpoint in {d}"
    return cs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/recipe_data")
    ap.add_argument("--saves", default="/tmp/recipe_saves")
    ap.add_argument("--train", type=int, default=960)
    ap.add_argument("--val", type=int, default=16)
    ap.add_argument("--test", type=int, default=16)
    ap.add_argument("--fresh", action="store_true",
                    help="wipe --saves before running")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: tiny model + tiny data, same phase "
                         "sequencing and handoffs")
    ap.add_argument("--from_phase", type=int, default=1,
                    help="skip phases < N, reusing their artifacts on disk "
                         "(features.hdf5 / checkpoint chains) — for resuming "
                         "an interrupted rehearsal without re-spending "
                         "tunnel-TPU time")
    a = ap.parse_args()
    global VOCAB_WORDS, IMG_SIZE
    tiny_model, tiny_feat = [], []
    if a.tiny:
        VOCAB_WORDS, IMG_SIZE = 200, 96
        a.train, a.val, a.test = 24, 4, 4
        tiny_model = TINY_CAP + TINY_SWIN
        tiny_feat = TINY_CAP + ["--img_feature_dim", "32"]
        global FORCE_CPU
        FORCE_CPU = True
    if a.fresh and os.path.isdir(a.saves):
        shutil.rmtree(a.saves)
    os.makedirs(a.saves, exist_ok=True)
    make_data(a.data, a.train, a.val, a.test)

    PKG = "on_device_image_captioning_tpu"
    feats = os.path.join(a.data, "features.hdf5")
    common = [
        "--dataset", "coco",
        "--annotations", os.path.join(a.data, "dataset_coco.json"),
        "--seed", "775533", "--optim_type", "radam",
        "--sched_type", "custom_warmup_anneal",
        # 10-minute cadence: the END-TO-END phases' checkpoints are ~3.5 GB
        # (233M params + RAdam moments, fp32) and each save pulls the whole
        # state through the device tunnel — at 1-minute cadence the phase-3
        # run spent more wall-clock saving than training (measured: ~20 min
        # per iteration+save cycle). 10 min still exercises save+rotation
        # (~2 saves per phase) without drowning the run.
        "--save_every_minutes", "10", "--how_many_checkpoints", "2",
    ]
    report = {}

    def skip(n, tag, artifact):
        if a.from_phase <= n:
            return False
        assert os.path.exists(artifact), (
            f"--from_phase {a.from_phase} skips {tag} but its artifact "
            f"{artifact} is absent")
        print(f"--- {tag}: SKIPPED (reusing {artifact}) ---", flush=True)
        report[tag.split()[0]] = 0.0
        return True

    # phase 1: Swin-L features (random backbone — no pretrained .pth here)
    if not skip(1, "p1_features", feats):
        report["p1_features"] = run("phase1 generate_features", [
            f"{PKG}.cli.generate_features",
            "--annotations", os.path.join(a.data, "dataset_coco.json"),
            "--images_path", os.path.join(a.data, "MS_COCO_2014"),
            "--output", feats, "--batch_size", "32", "--bf16",
            *( TINY_SWIN if a.tiny else [] ),
        ])

    # phase 2: XE on features (recipe hyperparams, 1 epoch) + a mid-phase
    # eval hook (beam decode + all-metric scoring on the val split)
    p2 = os.path.join(a.saves, "p2")
    if not skip(2, "p2_xe_features", p2):
        report["p2_xe_features"] = run("phase2 XE features", [
            f"{PKG}.cli.train", *common, "--save_path", p2 + "/",
            "--features_path", feats,
            "--warmup_iters", "100", "--lr", "2e-4", "--anneal_coeff", "0.8",
            "--anneal_every_epoch", "2", "--enc_drop", "0.3",
            "--dec_drop", "0.3", "--enc_input_drop", "0.3",
            "--dec_input_drop", "0.3",
            "--drop_other", "0.3", "--batch_size", "48", "--num_accum", "1",
            "--print_every_iter", "5", "--num_epochs", "1",
            "--eval_every_iter", "15", "--eval_beam_sizes", "3", *tiny_feat,
        ])
        # resume: second invocation picks the checkpoint up and continues
        report["p2_resume"] = run("phase2 RESUME", [
            f"{PKG}.cli.train", *common, "--save_path", p2 + "/",
            "--features_path", feats,
            "--warmup_iters", "100", "--lr", "2e-4", "--anneal_coeff", "0.8",
            "--anneal_every_epoch", "2", "--enc_drop", "0.3",
            "--dec_drop", "0.3", "--enc_input_drop", "0.3",
            "--dec_input_drop", "0.3",
            "--drop_other", "0.3", "--batch_size", "48", "--num_accum", "1",
            "--print_every_iter", "5", "--num_epochs", "2", *tiny_feat,
        ])

    # phase 3: XE end-to-end, body warm-started from phase 2 (recipe lr/batch)
    p3 = os.path.join(a.saves, "p3")
    if not skip(3, "p3_xe_e2e", p3):
        report["p3_xe_e2e"] = run("phase3 XE end-to-end", [
            f"{PKG}.cli.train", *common, "--save_path", p3 + "/",
            "--is_end_to_end", "--images_path",
            os.path.join(a.data, "MS_COCO_2014"),
            "--bf16", "--prefetch", "2", "--remat",
            "--warmup_iters", "1", "--lr", "3e-5", "--anneal_coeff", "0.55",
            "--anneal_every_epoch", "1", "--enc_drop", "0.3",
            "--dec_drop", "0.3", "--enc_input_drop", "0.3",
            "--dec_input_drop", "0.3",
            "--drop_other", "0.3", "--batch_size", "16", "--num_accum", "3",
            "--body_save_path", latest(p2),
            "--print_every_iter", "10", "--num_epochs", "1", *tiny_model,
        ])

    # phase 4: regenerate features with the phase-3 backbone
    if not skip(4, "p4_features", feats):
        report["p4_features"] = run("phase4 regenerate features", [
            f"{PKG}.cli.generate_features",
            "--annotations", os.path.join(a.data, "dataset_coco.json"),
            "--images_path", os.path.join(a.data, "MS_COCO_2014"),
            "--backbone_checkpoint", latest(p3),
            "--output", feats, "--batch_size", "32", "--bf16",
            *( TINY_SWIN if a.tiny else [] ),
        ])

    # phase 5: SCST on features, seeded from the phase-3 body; runs the
    # fused device-reward path (--device_reward) so both SCST reward
    # organizations get a full-size rehearsal (phase 6 = host reward)
    p5 = os.path.join(a.saves, "p5")
    if not skip(5, "p5_scst_features", p5):
        report["p5_scst_features"] = run("phase5 SCST features", [
            f"{PKG}.cli.train", *common, "--save_path", p5 + "/",
            "--features_path", feats, "--reinforce", "--scst_max_len", "20",
            "--device_reward",
            "--body_save_path", latest(p3),
            "--warmup_iters", "1", "--lr", "1e-4", "--anneal_coeff", "0.8",
            "--anneal_every_epoch", "1", "--enc_drop", "0.1",
            "--dec_drop", "0.1", "--enc_input_drop", "0.1",
            "--dec_input_drop", "0.1",
            "--drop_other", "0.1", "--batch_size", "24", "--num_accum", "2",
            "--print_every_iter", "5", "--num_epochs", "1", *tiny_feat,
        ])

    # phase 6: SCST end-to-end (phase-3 backbone + phase-5 body)
    p6 = os.path.join(a.saves, "p6")
    report["p6_scst_e2e"] = run("phase6 SCST end-to-end", [
        f"{PKG}.cli.train", *common, "--save_path", p6 + "/",
        "--is_end_to_end", "--images_path", os.path.join(a.data, "MS_COCO_2014"),
        "--bf16", "--prefetch", "2", "--remat",
        "--reinforce", "--scst_max_len", "20",
        "--backbone_save_path", latest(p3), "--body_save_path", latest(p5),
        "--warmup_iters", "1", "--lr", "2e-6", "--anneal_coeff", "1.0",
        "--anneal_every_epoch", "1", "--enc_drop", "0.1", "--dec_drop", "0.1",
        "--enc_input_drop", "0.1", "--dec_input_drop", "0.1",
        "--drop_other", "0.1", "--batch_size", "24", "--num_accum", "2",
        "--print_every_iter", "5", "--num_epochs", "1", *tiny_model,
    ])

    print("=== rehearsal wall-clock per phase (s) ===")
    for k, v in report.items():
        print(f"  {k:18s} {v:8.1f}")
    print("checkpoint chain:")
    for d in ("p2", "p3", "p5", "p6"):
        full = os.path.join(a.saves, d)
        print(f"  {d}: {sorted(os.listdir(full))}")


if __name__ == "__main__":
    main()
