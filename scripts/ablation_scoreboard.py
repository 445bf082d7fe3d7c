"""Ablation scoreboard from TRAINED checkpoints (VERDICT r4 item 1).

The reference fork's headline contribution is its ablation result tables —
pruning rounds (benchmarking/benchmarking.py:123-151: repeated global L1
unstructured 33%), layer-removal param_config variants (train.py:305-342),
and ensemble scores (README.md:89-97), tabulated in
benchmarking/plotting.py:3-50. Every mechanism here is implemented and
parity-tested; this script produces the actual RESULT rows from the trained
synthetic-corpus checkpoints (scripts/converge_synthetic.py), all through
the production cli/evaluate.py + cli/train.py:

  baseline rows   : XE checkpoint, SCST checkpoint (single model, bf16 fused)
  ensemble rows   : 2-model (XE+SCST) and 3-model (XE_e31+XE_e39+SCST)
                    ensemble_beam_search through --load_path A B [C]
  pruning curve   : rounds 1..3 of global 33% L1 on the SCST weights
                    (compounding: ~33% / ~55% / ~70% sparsity), each saved
                    as a SPARSE checkpoint and evaluated via --load_pruned
                    (exercises the save_sparse/load_sparse round trip)
  layer removal   : param_config 1 (-1 enc) and 2 (-1 enc -1 dec) surgery
                    applied at load (reduce_group slice), evaluated raw AND
                    after a short XE finetune (the reference always
                    finetunes after surgery — train.py:305-342)

Usage:
    python scripts/ablation_scoreboard.py [--tiny] [--skip_finetune]
        [--data /tmp/converge_data] [--saves /tmp/converge_saves]
        [--out artifacts/ablation_r05]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import converge_synthetic as cs  # noqa: E402  (run/latest/parse_scores + geometry)

PKG = "on_device_image_captioning_tpu"


def prep_pruned(scst_ckpt, out_dir, rounds, tiny):
    """Subprocess: load the SCST checkpoint, apply compounding 33% L1 global
    magnitude pruning, save each round as a sparse npz. CPU-pinned — pruning
    is a host-side numpy transform."""
    os.makedirs(out_dir, exist_ok=True)
    code = f"""
import sys, json, numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, {REPO!r})
from on_device_image_captioning_tpu.utils.checkpointing import load_checkpoint
from on_device_image_captioning_tpu.deploy.pruning import (
    global_l1_prune, save_sparse, sparsity_report)
params = load_checkpoint({scst_ckpt!r})["params"]
report = {{}}
for n in range(1, {rounds} + 1):
    params = global_l1_prune(params, amount=0.33)
    path = f"{out_dir}/scst_pruned_r{{n}}.npz"
    save_sparse(path, params)
    rep = sparsity_report(params)
    import os as _os
    report[f"r{{n}}"] = {{
        "overall_sparsity_pct": round(rep["GLOBAL"] * 100, 2),
        "npz_bytes": _os.path.getsize(path),
    }}
    print(f"round {{n}}: overall sparsity {{rep['GLOBAL']*100:.2f}}% -> "
          f"{{path}} ({{_os.path.getsize(path)/1e6:.1f}} MB)")
json.dump(report, open(f"{out_dir}/sparsity.json", "w"), indent=1)
"""
    import subprocess

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    print(f"--- prep_pruned: rc={proc.returncode} in {time.time()-t0:.1f}s ---\n"
          f"{proc.stdout}", flush=True)
    if proc.returncode != 0:
        raise SystemExit("prep_pruned failed")
    with open(os.path.join(out_dir, "sparsity.json")) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/converge_data")
    ap.add_argument("--saves", default="/tmp/converge_saves")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "ablation_r05"))
    ap.add_argument("--prune_rounds", type=int, default=3)
    ap.add_argument("--finetune_epochs", type=int, default=6)
    ap.add_argument("--skip_finetune", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke over the converge --tiny artifacts")
    ap.add_argument("--resume", action="store_true",
                    help="reuse /tmp/converge_ablate_eval_<row>.log rows that "
                         "already parse to all 8 scores (crash recovery)")
    ap.add_argument("--max_seq_len", default=None,
                    help="decode budget; defaults to the value recorded in "
                         "<saves>/convergence_report.json (so hard-corpus "
                         "L74 checkpoints evaluate at their training budget)")
    a = ap.parse_args()

    if a.max_seq_len is None:
        rep_path = os.path.join(a.saves, "convergence_report.json")
        if os.path.exists(rep_path):
            with open(rep_path) as f:
                a.max_seq_len = str(json.load(f)["config"]["max_seq_len"])
        else:
            a.max_seq_len = cs.MAX_SEQ_LEN
    cs.MAX_SEQ_LEN = str(a.max_seq_len)

    cs.FORCE_CPU = a.tiny
    swin, cap = (cs.TINY_SWIN, cs.TINY_CAP) if a.tiny else (cs.SWIN_S, cs.CAP_FULL)
    n_enc = int(cap[cap.index("--N_enc") + 1])
    os.makedirs(a.out, exist_ok=True)

    ann = os.path.join(a.data, "dataset_coco.json")
    vocab_path = os.path.join(a.data, "synthetic_vocab.json")
    store = os.path.join(a.data, "preproc_images.hdf5")
    common_data = ["--dataset", "coco", "--annotations", ann,
                   "--vocab_path", vocab_path,
                   "--images_path", os.path.join(a.data, "MS_COCO_2014")]

    xe_dir = os.path.join(a.saves, "xe")
    scst_dir = os.path.join(a.saves, "scst")
    xe_ckpts = sorted(
        (os.path.join(xe_dir, f) for f in os.listdir(xe_dir)
         if f.startswith("checkpoint_")), key=os.path.getmtime)
    xe_ckpt, scst_ckpt = xe_ckpts[-1], cs.latest(scst_dir)

    bf16 = [] if a.tiny else ["--bf16"]
    eval_common = [
        f"{PKG}.cli.evaluate", *common_data, *swin, *cap,
        "--split", "test", "--beam_sizes", "3",
        "--max_seq_len", cs.MAX_SEQ_LEN, "--batch_size", "32",
        "--metrics", "bleu", "meteor", "rouge", "cider", "spice",
    ]

    # ---- pruned sparse checkpoints (host-side prep) -------------------------
    pruned_dir = os.path.join(a.saves, "pruned")
    sparsity = prep_pruned(scst_ckpt, pruned_dir, a.prune_rounds, a.tiny)

    # ---- param_config finetunes (reference always finetunes after surgery) --
    ft_rows = {}
    do_pc = n_enc == 3  # surgery assumes the canonical 3-layer stacks
    if not a.skip_finetune and do_pc:
        for pc in (1, 2):
            ft_dir = os.path.join(a.saves, f"pc{pc}_ft")
            if not os.path.isdir(ft_dir) or not any(
                f.startswith("checkpoint_") for f in os.listdir(ft_dir)
            ):
                _, dt = cs.run(f"ablate_pc{pc}_finetune", [
                    f"{PKG}.cli.train", *common_data, *swin, *cap,
                    "--is_end_to_end", "--preproc_images_hdf5", store,
                    "--save_path", ft_dir + "/",
                    "--max_seq_len", cs.MAX_SEQ_LEN,
                    "--pretrain_checkpoint", xe_ckpt,
                    "--param_config", str(pc),
                    "--seed", "775540", "--optim_type", "radam",
                    "--sched_type", "custom_warmup_anneal",
                    "--warmup_iters", "20", "--lr", "5e-5",
                    "--anneal_coeff", "0.8", "--anneal_every_epoch", "3",
                    "--batch_size", "8" if a.tiny else "32",
                    "--num_accum", "1",
                    "--num_epochs", str(1 if a.tiny else a.finetune_epochs),
                    "--eval_every_iter", "100000",
                    "--save_every_minutes", "30",
                    "--how_many_checkpoints", "1",
                    "--print_every_iter", "50",
                    *([] if a.tiny else ["--bf16", "--prefetch", "2"]),
                ])
                ft_rows[f"pc{pc}_finetune_s"] = dt
            ft_rows[f"pc{pc}_ckpt"] = cs.latest(ft_dir)

    # ---- evaluation rows -----------------------------------------------------
    variants = {
        "xe_single": ["--load_path", xe_ckpt, *bf16],
        "scst_single": ["--load_path", scst_ckpt, *bf16],
        "ensemble_xe_scst": ["--load_path", xe_ckpt, scst_ckpt, *bf16],
    }
    if len(xe_ckpts) >= 2:
        variants["ensemble3"] = [
            "--load_path", xe_ckpts[-2], xe_ckpts[-1], scst_ckpt, *bf16,
        ]
    for n in range(1, a.prune_rounds + 1):
        variants[f"pruned_r{n}"] = [
            "--load_path", os.path.join(pruned_dir, f"scst_pruned_r{n}.npz"),
            "--load_pruned", *bf16,
        ]
    if do_pc:
        variants["pc1_raw"] = [
            "--load_path", scst_ckpt, "--param_config", "1", *bf16]
        variants["pc2_raw"] = [
            "--load_path", scst_ckpt, "--param_config", "2", *bf16]
        for pc in (1, 2):
            ck = ft_rows.get(f"pc{pc}_ckpt")
            if ck:
                variants[f"pc{pc}_finetuned"] = [
                    "--load_path", ck, "--param_config", str(pc), *bf16]

    results, report = {}, dict(ft_rows)
    for name, extra in variants.items():
        log = os.path.join("/tmp", f"converge_ablate_eval_{name}.log")
        if a.resume and os.path.exists(log):
            sc = cs.parse_scores(log)
            if len(sc) == 8:
                print(f"--- ablate_eval_{name}: RESUMED from {log} ---",
                      flush=True)
                results[name] = sc
                report[f"eval_{name}_s"] = "resumed"
                continue
        log, dt = cs.run(f"ablate_eval_{name}", eval_common + extra)
        results[name] = cs.parse_scores(log)
        report[f"eval_{name}_s"] = round(dt, 1)

    # ---- report --------------------------------------------------------------
    keys = ("Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr", "SPICE")
    print("\n=== ablation scoreboard (held-out test, beam 3) ===")
    print("row".ljust(18) + "".join(k.rjust(9) for k in keys) + "  notes")
    for name, sc in results.items():
        note = ""
        m = name.startswith("pruned_r") and name[-1]
        if m and f"r{m}" in sparsity:
            note = f"sparsity {sparsity[f'r{m}']['overall_sparsity_pct']}%"
        print(name.ljust(18)
              + "".join(f"{sc.get(k, float('nan')):9.3f}" for k in keys)
              + f"  {note}")
    out = {"results": results, "sparsity": sparsity, "report": report,
           "checkpoints": {"xe": xe_ckpt, "scst": scst_ckpt,
                           "xe_all": xe_ckpts}}
    path = os.path.join(a.out, "ablation_scoreboard.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nreport JSON: {path}")


if __name__ == "__main__":
    main()
