"""Stage the round-5 hard-corpus convergence artifacts into the repo
(mirrors the round-4 layout: CONVERGENCE_r05.json at the root + the raw
prediction dumps and drift anatomy under artifacts/convergence_r05/).

    python scripts/r5_stage_artifacts.py [--saves /tmp/converge_hard_saves]
"""
import argparse
import json
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--saves", default="/tmp/converge_hard_saves")
    a = ap.parse_args()

    rep = os.path.join(a.saves, "convergence_report.json")
    with open(rep) as f:
        report = json.load(f)
    with open(os.path.join(REPO, "CONVERGENCE_r05.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote CONVERGENCE_r05.json")

    out = os.path.join(REPO, "artifacts", "convergence_r05")
    os.makedirs(out, exist_ok=True)
    for fname in sorted(os.listdir(a.saves)):
        if fname.startswith("preds_") or fname == "drift_anatomy.json":
            shutil.copy(os.path.join(a.saves, fname), os.path.join(out, fname))
            print("staged", fname)


if __name__ == "__main__":
    main()
