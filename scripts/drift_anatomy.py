"""Tie anatomy for serving-config caption drift (VERDICT r4 item 2).

When two serving configurations (fp32-XLA vs bf16-fused / w8 / w8a8) decode
different captions for the same image, the question is WHETHER the
divergences are quality-affecting or score-neutral near-ties — the
reference's operating regime (test.py:141-275, 10k-vocab open captions)
makes near-ties common, and a <100% identical rate with tie anatomy is a
more honest result than a saturated 100%.

For every variant dump in a converge_synthetic saves dir this reports, over
the diverging images only: the first-diverging token position, caption
lengths, and per-image CIDEr-D of BOTH sides' captions against the held-out
references (evalcap/cider.py, the parity-tested scorer) — if the mean CIDEr
delta is ~0 while captions differ, the drift is beam near-ties, not
degradation.

    python scripts/drift_anatomy.py [--saves /tmp/converge_hard_saves]
        [--data /tmp/converge_hard_data] [--base fp32_xla] [--beam 3]
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from on_device_image_captioning_tpu.evalcap.cider import CiderCorpus  # noqa: E402
from on_device_image_captioning_tpu.evalcap.tokenizer import (  # noqa: E402
    ptb_tokenize_sentence,
)


def _ptb(s):
    return " ".join(ptb_tokenize_sentence(s))


def first_diff_token(a, b):
    ta, tb = a.split(), b.split()
    for i, (x, y) in enumerate(zip(ta, tb)):
        if x != y:
            return i
    return min(len(ta), len(tb))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--saves", default="/tmp/converge_hard_saves")
    ap.add_argument("--data", default="/tmp/converge_hard_data")
    ap.add_argument("--base", default="fp32_xla")
    ap.add_argument("--beam", default="3")
    ap.add_argument("--variants", nargs="*",
                    default=["bf16_fused", "w8", "w8a8"])
    ap.add_argument("--examples", type=int, default=4)
    a = ap.parse_args()

    with open(os.path.join(a.data, "dataset_coco.json")) as f:
        karpathy = json.load(f)["images"]
    refs_by_id = {
        im["cocoid"]: [_ptb(s["raw"]) for s in im["sentences"]]
        for im in karpathy if im["split"] == "test"
    }
    ids = sorted(refs_by_id)
    corpus = CiderCorpus([refs_by_id[i] for i in ids])
    idx_of = {str(i): k for k, i in enumerate(ids)}

    def load(name):
        with open(os.path.join(a.saves, f"preds_{name}.json")) as f:
            return json.load(f)[a.beam]

    base = load(a.base)
    report = {}
    for name in a.variants:
        preds = load(name)
        div = [k for k in base if preds.get(k) != base[k]]
        row = {"identical_pct": round(100.0 * (1 - len(div) / len(base)), 1),
               "n_diverging": len(div)}
        if div:
            hyps_b = [_ptb(base[k]) for k in div]
            hyps_v = [_ptb(preds[k]) for k in div]
            ridx = [idx_of[k] for k in div]
            cb = corpus.score_hypotheses(hyps_b, ridx)
            cv = corpus.score_hypotheses(hyps_v, ridx)
            deltas = cv - cb
            fdt = [first_diff_token(base[k], preds[k]) for k in div]
            row.update({
                "cider_base_mean": round(float(cb.mean()), 4),
                "cider_variant_mean": round(float(cv.mean()), 4),
                "cider_delta_mean": round(float(deltas.mean()), 4),
                "cider_delta_max_abs": round(float(abs(deltas).max()), 4),
                "first_diff_token_min": min(fdt),
                "first_diff_token_median": sorted(fdt)[len(fdt) // 2],
                "len_delta_mean": round(sum(
                    len(preds[k].split()) - len(base[k].split()) for k in div
                ) / len(div), 2),
            })
            row["examples"] = [
                {"image": k, "base": base[k], "variant": preds[k],
                 "cider_base": round(float(b), 3),
                 "cider_variant": round(float(v), 3)}
                for k, b, v in list(zip(div, cb, cv))[: a.examples]
            ]
        report[name] = row
        print(f"\n=== {name} vs {a.base} ===")
        for k, v in row.items():
            if k != "examples":
                print(f"  {k}: {v}")
        for ex in row.get("examples", []):
            print(f"  [{ex['image']}] base({ex['cider_base']}): {ex['base']}")
            print(f"  [{ex['image']}]  var({ex['cider_variant']}): "
                  f"{ex['variant']}")

    out = os.path.join(a.saves, "drift_anatomy.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nreport JSON: {out}")


if __name__ == "__main__":
    main()
