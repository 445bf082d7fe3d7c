"""SCST reward computation: CIDEr over sampled captions with a frozen training
document-frequency corpus.

Rebuild of the reference's reward pipeline (reference losses/reward.py:8-89 +
eval/cider/reinforce_cider.py): all training references are preprocessed once in
the constructor (cheap regex pipeline, not the PTB jar) with EOS appended; each
batch scores `num_samples` sampled captions per image against that image's
references using document frequencies precomputed over the whole training corpus.

The reward runs on host between the device-side sampling call and the device-side
gradient step (see train_step.make_scst_step) — strings never touch the TPU.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..data.text import Vocab, clean_caption
from ..evalcap.cider import CiderCorpus


class CiderReward:
    def __init__(
        self,
        training_references: Sequence[List[str]],
        eos_token: str = "EOS",
        use_native: str = "auto",
    ):
        """use_native: 'auto' picks the C++ scorer (native/cider.cc) when the
        toolchain built it — ~10x less host time per SCST step; 'never' forces
        the Python scorer (identical numerics, see tests/test_native_cider.py)."""
        processed = [
            [clean_caption(c) + " " + eos_token for c in refs]
            for refs in training_references
        ]
        self.corpus = None
        if use_native in ("auto", "always"):
            try:
                from ..evalcap.cider_native import NativeCiderCorpus

                if NativeCiderCorpus.available():
                    self.corpus = NativeCiderCorpus(processed)
            except Exception:
                if use_native == "always":
                    raise
        if self.corpus is None:
            self.corpus = CiderCorpus(processed)
        self.eos_token = eos_token

    def __call__(
        self, sampled_tokens: np.ndarray, lengths: np.ndarray, image_indices, vocab: Vocab
    ) -> np.ndarray:
        """sampled_tokens: (B, N, L+1) int with SOS prefix; lengths: (B, N) index
        of first EOS; image_indices: (B,) indices into the training corpus.
        Returns rewards (B, N).

        The SOS token is dropped but EOS is kept in the scored string — the
        reference calls this out as important for correct SCST credit assignment
        (reference losses/reward.py:40-45).
        """
        b, n, _ = sampled_tokens.shape
        rewards = np.zeros((b, n), np.float32)
        hyps, ref_idx = [], []
        for i in range(b):
            for j in range(n):
                toks = sampled_tokens[i, j, 1 : lengths[i, j] + 1].tolist()
                hyps.append(" ".join(vocab.idx2word[t] for t in toks))
                ref_idx.append(int(image_indices[i]))
        scores = self.corpus.score_hypotheses(hyps, ref_idx)
        return scores.reshape(b, n).astype(np.float32)
