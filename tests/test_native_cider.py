"""Native C++ CIDEr scorer: parity with the Python scorer (which is itself
parity-tested against the reference's coco-caption implementation) and a
throughput sanity check."""
import time

import numpy as np
import pytest

from on_device_image_captioning_tpu.evalcap.cider import CiderCorpus
from on_device_image_captioning_tpu.evalcap.cider_native import NativeCiderCorpus

pytestmark = pytest.mark.skipif(
    not NativeCiderCorpus.available(), reason="no C++ toolchain"
)


def _corpus(num_images=40, seed=0):
    rng = np.random.default_rng(seed)
    words = (
        "a the cat dog man woman rides holds red blue ball bike table sits on "
        "with near under large small two three street park grass sky EOS"
    ).split()
    refs, hyps = [], []
    for _ in range(num_images):
        refs.append(
            [" ".join(rng.choice(words, size=rng.integers(4, 12))) for _ in range(5)]
        )
        base = refs[-1][0].split()
        k = rng.integers(0, len(base))
        hyps.append(" ".join(base[:k] + list(rng.choice(words, size=max(1, len(base) - k)))))
    return refs, hyps


def test_native_matches_python():
    refs, hyps = _corpus()
    py = CiderCorpus(refs)
    nat = NativeCiderCorpus(refs)
    want = py.score_hypotheses(hyps)
    got = nat.score_hypotheses(hyps)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_native_with_ref_indices_and_unseen_words():
    refs, _ = _corpus(10)
    py = CiderCorpus(refs)
    nat = NativeCiderCorpus(refs)
    hyps = ["a cat zzzunseen words qqq", "the dog sits on grass EOS"] * 3
    idx = [0, 3, 7, 2, 9, 5]
    np.testing.assert_allclose(
        nat.score_hypotheses(hyps, idx), py.score_hypotheses(hyps, idx),
        rtol=1e-5, atol=1e-6,
    )


def test_native_repeated_scoring_stable():
    """Lazy ref-vec caching and unseen-word registration must not drift scores."""
    refs, hyps = _corpus(8, seed=3)
    nat = NativeCiderCorpus(refs)
    first = nat.score_hypotheses(hyps)
    second = nat.score_hypotheses(hyps)
    np.testing.assert_array_equal(first, second)


def test_native_faster_than_python():
    refs, hyps = _corpus(200, seed=1)
    hyps = hyps * 5  # SCST-scale batch: 1000 hypotheses
    idx = list(range(200)) * 5
    py = CiderCorpus(refs)
    nat = NativeCiderCorpus(refs)
    t0 = time.perf_counter()
    py.score_hypotheses(hyps, idx)
    t_py = time.perf_counter() - t0
    nat.score_hypotheses(hyps, idx)  # warm ref-vec cache
    t0 = time.perf_counter()
    nat.score_hypotheses(hyps, idx)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py, (t_nat, t_py)
