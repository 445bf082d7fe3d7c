"""Adversarial-corpus deltas for the embedded synonym/paraphrase tables
(VERDICT r2 item 5 / r3 item 9 methodology, now committed instead of ad hoc).

Builds synthetic (hypothesis, reference) corpora where a fraction of words /
phrases are substituted through the embedded tables — the caption-domain
stand-ins for the jar's WordNet + paraphrase-en.gz data files (absent from
this zero-egress environment) — and reports how much corpus METEOR / SPICE
the synonym and paraphrase stages recover vs exact/stem-only matching. This
quantifies what the tables BUY; the residual vs the jar (WordNet synsets and
paraphrase pairs outside the tables) is unmeasurable here by construction
and is documented as final in STATUS.md.

    python scripts/scorer_table_deltas.py [n_pairs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    from on_device_image_captioning_tpu.evalcap import meteor_native as mn
    from on_device_image_captioning_tpu.evalcap.meteor_native import (
        PARAPHRASE_GROUPS,
        SYNONYM_GROUPS,
    )
    from on_device_image_captioning_tpu.evalcap.spice_native import (
        NativeSpiceScorer,
    )

    def corpus_score(gts, res, stage_weights):
        """Corpus METEOR (NativeMeteorScorer.compute's micro-average) with
        an explicit matcher-stage configuration."""
        agg = {"w_hyp": 0.0, "w_ref": 0.0, "wm_hyp": 0.0, "wm_ref": 0.0,
               "chunks": 0, "matches": 0}
        for i in gts:
            s = mn._segment_stats(res[i][0], gts[i],
                                  stage_weights=stage_weights)
            for k in agg:
                agg[k] += getattr(s, k)
        p = agg["wm_hyp"] / agg["w_hyp"]
        r = agg["wm_ref"] / agg["w_ref"]
        fmean = p * r / (mn.ALPHA * p + (1.0 - mn.ALPHA) * r)
        return (1.0 - mn.GAMMA * (agg["chunks"] / agg["matches"]) ** mn.BETA) * fmean

    words = sorted(set().union(*SYNONYM_GROUPS))
    print(f"synonym table: {len(SYNONYM_GROUPS)} groups, "
          f"{len(words)} distinct words")
    print(f"paraphrase table: {len(PARAPHRASE_GROUPS)} groups, "
          f"{sum(len(g) for g in PARAPHRASE_GROUPS)} phrases")

    rng = np.random.default_rng(20260819)
    groups = [sorted(g) for g in SYNONYM_GROUPS if len(g) >= 2]

    # --- synonym corpus: reference sentences from table words; hypothesis
    # substitutes 35% of content words with an in-group synonym -------------
    gts, res = {}, {}
    for i in range(n_pairs):
        n = int(rng.integers(7, 13))
        gidx = rng.integers(0, len(groups), n)
        ref_words, hyp_words = [], []
        for g in gidx:
            grp = groups[g]
            w = grp[rng.integers(len(grp))]
            ref_words.append(w)
            if rng.random() < 0.35 and len(grp) >= 2:
                alt = [x for x in grp if x != w]
                hyp_words.append(alt[rng.integers(len(alt))])
            else:
                hyp_words.append(w)
        gts[i] = ["a " + " ".join(ref_words)]
        res[i] = ["a " + " ".join(hyp_words)]

    t0 = time.time()
    m2 = corpus_score(gts, res, (1.0, 0.6))
    m3 = corpus_score(gts, res, (1.0, 0.6, 0.8))
    spice = NativeSpiceScorer()
    s_on, _ = spice.compute(gts, res)
    print(f"\nsynonym corpus ({n_pairs} pairs, 35% in-group substitution):")
    print(f"  METEOR exact+stem only : {m2:.4f}")
    print(f"  METEOR +synonym stage  : {m3:.4f}   (delta +{m3 - m2:.4f})")
    print(f"  SPICE (lemma/stem/syn) : {s_on:.4f}")

    # --- paraphrase corpus: multiword phrases substituted through the
    # paraphrase table -------------------------------------------------------
    pgroups = [g for g in PARAPHRASE_GROUPS if len(g) >= 2]
    filler = sorted(set().union(*SYNONYM_GROUPS))
    gts_p, res_p = {}, {}
    for i in range(n_pairs):
        segs_r, segs_h = [], []
        for _ in range(3):
            fw = filler[rng.integers(len(filler))]
            segs_r.append(fw)
            segs_h.append(fw)
            g = pgroups[rng.integers(len(pgroups))]
            pr = g[rng.integers(len(g))]
            segs_r.append(" ".join(pr))
            if rng.random() < 0.35:
                alt = [x for x in g if x != pr]
                segs_h.append(" ".join(alt[rng.integers(len(alt))]))
            else:
                segs_h.append(" ".join(pr))
        gts_p[i] = [" ".join(segs_r)]
        res_p[i] = [" ".join(segs_h)]

    p3 = corpus_score(gts_p, res_p, (1.0, 0.6, 0.8))
    p4 = corpus_score(gts_p, res_p, (1.0, 0.6, 0.8, 0.6))
    print(f"\nparaphrase corpus ({n_pairs} pairs, 35% phrase substitution):")
    print(f"  METEOR 3-stage         : {p3:.4f}")
    print(f"  METEOR +paraphrase     : {p4:.4f}   (delta +{p4 - p3:.4f})")
    print(f"\ntotal wall time {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
