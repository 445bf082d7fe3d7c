"""Device-side CIDEr-D vs the host scorer: token-for-token reward parity.

The device path (train/device_cider.py) must reproduce
evalcap.cider.CiderCorpus.score_hypotheses (itself 1e-6-parity with
coco-caption) through the same EOS framing train/scst.CiderReward uses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from on_device_image_captioning_tpu.data.text import (
    EOS_TOKEN, PAD_TOKEN, SOS_TOKEN, UNK_TOKEN, Vocab,
)
from on_device_image_captioning_tpu.train.device_cider import (
    DeviceCiderCorpus, cider_reward,
)
from on_device_image_captioning_tpu.train.scst import CiderReward


def _vocab(n_words=40):
    words = [PAD_TOKEN, SOS_TOKEN, EOS_TOKEN, UNK_TOKEN] + [
        f"w{i}" for i in range(n_words)
    ]
    return Vocab({w: i for i, w in enumerate(words)})


def _random_refs(rng, vocab, n_images, r_lo=2, r_hi=5):
    words = [w for w in vocab.idx2word[4:]]
    refs = []
    for _ in range(n_images):
        n_refs = int(rng.integers(r_lo, r_hi + 1))
        refs.append(
            [
                " ".join(rng.choice(words, size=int(rng.integers(1, 12)),
                                    replace=True))
                for _ in range(n_refs)
            ]
        )
    return refs


def _sampled_from_captions(vocab, captions, L):
    """captions: list over images of list over samples of word lists ->
    (B, S, L+1) tokens with SOS prefix + EOS, and lengths."""
    b = len(captions)
    s = len(captions[0])
    toks = np.full((b, s, L + 1), vocab.pad_idx, np.int32)
    lens = np.zeros((b, s), np.int32)
    toks[:, :, 0] = vocab.sos_idx
    for i, rows in enumerate(captions):
        for j, words in enumerate(rows):
            ids = [vocab.word2idx[w] for w in words] + [vocab.eos_idx]
            toks[i, j, 1 : 1 + len(ids)] = ids
            lens[i, j] = len(ids)
    return jnp.asarray(toks), jnp.asarray(lens)


def _device_scores(corpus, toks, lens, img_idx):
    bt = {k: jnp.asarray(v) for k, v in corpus.batch(img_idx).items()}
    dt = corpus.device_tables()
    return np.asarray(
        jax.jit(
            lambda t, l, b: cider_reward(
                t, l, b, dt, corpus.probe_depths, corpus.log_ref_len
            )
        )(toks, lens, bt)
    )


def test_device_cider_matches_host_fuzz():
    rng = np.random.default_rng(0)
    vocab = _vocab(40)
    refs = _random_refs(rng, vocab, n_images=30)
    host = CiderReward(refs, use_native="never")
    dev = DeviceCiderCorpus(refs, vocab)

    b, s, L = 6, 3, 16
    img_idx = rng.integers(0, len(refs), b)
    words = [w for w in vocab.idx2word[4:]]
    captions = [
        [
            list(rng.choice(words, size=int(rng.integers(1, L - 1)),
                            replace=True))
            for _ in range(s)
        ]
        for _ in range(b)
    ]
    toks, lens = _sampled_from_captions(vocab, captions, L)
    got = _device_scores(dev, toks, lens, img_idx)
    want = host(np.asarray(toks), np.asarray(lens), img_idx, vocab)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_device_cider_exact_match_and_repeats():
    rng = np.random.default_rng(1)
    vocab = _vocab(10)
    refs = [
        ["w0 w1 w2 w3 w4", "w0 w0 w0 w1", "w2 w3"],
        ["w5 w6 w5 w6 w5", "w6 w5 w6"],
    ]
    host = CiderReward(refs, use_native="never")
    dev = DeviceCiderCorpus(refs, vocab)
    captions = [
        [["w0", "w1", "w2", "w3", "w4"], ["w0", "w0", "w0", "w0"]],
        [["w5", "w6", "w5", "w6", "w5"], ["w9"]],
    ]
    toks, lens = _sampled_from_captions(vocab, captions, L=8)
    img_idx = np.array([0, 1])
    got = _device_scores(dev, toks, lens, img_idx)
    want = host(np.asarray(toks), np.asarray(lens), img_idx, vocab)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_device_cider_short_and_immediate_eos():
    vocab = _vocab(10)
    refs = [["w0 w1", "w2"]]
    host = CiderReward(refs, use_native="never")
    dev = DeviceCiderCorpus(refs, vocab)
    captions = [[["w0"], []]]  # one-word caption; empty caption (EOS only)
    toks, lens = _sampled_from_captions(vocab, captions, L=6)
    img_idx = np.array([0])
    got = _device_scores(dev, toks, lens, img_idx)
    want = host(np.asarray(toks), np.asarray(lens), img_idx, vocab)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_device_cider_oov_reference_words():
    """Reference words outside the model vocabulary get private extended ids:
    distinct OOV words must not alias each other or UNK."""
    vocab = _vocab(6)
    refs = [["w0 zebra w1", "w0 quagga w1"], ["w2 zebra"]]
    host = CiderReward(refs, use_native="never")
    dev = DeviceCiderCorpus(refs, vocab)
    captions = [[["w0", "w1"]], [["w2"]]]
    toks, lens = _sampled_from_captions(vocab, captions, L=5)
    img_idx = np.array([0, 1])
    got = _device_scores(dev, toks, lens, img_idx)
    want = host(np.asarray(toks), np.asarray(lens), img_idx, vocab)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_device_cider_idf_lookup_misses_yield_logn():
    """A sampled gram absent from the whole corpus must weigh in at
    idf = log(N) (the host scorer's df=0 branch) through the hash-table
    miss path."""
    vocab = _vocab(10)
    refs = [["w0 w1"], ["w2 w3"], ["w4 w5"], ["w6 w7"]]
    host = CiderReward(refs, use_native="never")
    dev = DeviceCiderCorpus(refs, vocab)
    captions = [[["w8", "w9", "w8", "w9"]]]  # nothing from the corpus
    toks, lens = _sampled_from_captions(vocab, captions, L=6)
    img_idx = np.array([2])
    got = _device_scores(dev, toks, lens, img_idx)
    want = host(np.asarray(toks), np.asarray(lens), img_idx, vocab)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
