"""Scorer parity: our BLEU/ROUGE-L/CIDEr must match the reference's pure-Python
coco-caption scorers on synthetic corpora (the reference ports are the ground
truth the published numbers were computed with)."""
import numpy as np
import pytest

from on_device_image_captioning_tpu.evalcap.bleu import compute_bleu
from on_device_image_captioning_tpu.evalcap.cider import CiderCorpus, compute_cider
from on_device_image_captioning_tpu.evalcap.harness import evaluate_captions
from on_device_image_captioning_tpu.evalcap.rouge import compute_rouge
from on_device_image_captioning_tpu.evalcap.tokenizer import ptb_tokenize_sentence


def _synthetic_corpus(num_images=30, seed=0):
    rng = np.random.default_rng(seed)
    words = (
        "a the cat dog man woman rides holds red blue ball bike table sits on "
        "with near under large small two three street park grass sky water food"
    ).split()
    gts, res = {}, {}
    for i in range(num_images):
        refs = [
            " ".join(rng.choice(words, size=rng.integers(5, 12)))
            for _ in range(5)
        ]
        # hypothesis: corrupted first reference for nontrivial overlap
        base = refs[0].split()
        k = rng.integers(0, len(base))
        hyp = base[:k] + list(rng.choice(words, size=max(1, len(base) - k)))
        gts[i] = refs
        res[i] = [" ".join(hyp)]
    return gts, res


@pytest.fixture(scope="module")
def corpus():
    return _synthetic_corpus()


def test_bleu_matches_reference(reference_path, corpus):
    from eval.bleu.bleu import Bleu

    gts, res = corpus
    ref_scores, ref_per = Bleu(4).compute_score(gts, res)
    got_scores, got_per = compute_bleu(gts, res)
    np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-9)
    np.testing.assert_allclose(got_per, ref_per, rtol=1e-9)


def test_rouge_matches_reference(reference_path, corpus):
    from eval.rouge.rouge import Rouge

    gts, res = corpus
    ref_score, ref_per = Rouge().compute_score(gts, res)
    got_score, got_per = compute_rouge(gts, res)
    np.testing.assert_allclose(got_score, ref_score, rtol=1e-9)
    np.testing.assert_allclose(got_per, ref_per, rtol=1e-9)


def test_cider_matches_reference(reference_path, corpus):
    from eval.cider.cider import Cider

    gts, res = corpus
    ref_score, ref_per = Cider().compute_score(gts, res)
    got_score, got_per = compute_cider(gts, res)
    np.testing.assert_allclose(got_score, ref_score, rtol=1e-9)
    np.testing.assert_allclose(got_per, ref_per, rtol=1e-9)


def test_reinforce_cider_matches_reference(reference_path, corpus):
    """Frozen-DF variant used for SCST rewards
    (reference eval/cider/reinforce_cider.py)."""
    from eval.cider.reinforce_cider import ReinforceCider

    gts, res = corpus
    train_refs = [gts[i] for i in sorted(gts)]
    hyps = [res[i][0] for i in sorted(res)]
    ref = ReinforceCider(train_refs)
    ref_score, ref_per = ref.compute_score(hypo=hyps, refs=train_refs)
    ours = CiderCorpus(train_refs)
    got = ours.score_hypotheses(hyps)
    np.testing.assert_allclose(got, np.asarray(ref_per), rtol=1e-9)
    np.testing.assert_allclose(float(got.mean()), ref_score, rtol=1e-9)


def test_ptb_tokenizer_basics():
    assert ptb_tokenize_sentence("A man's dog, (brown) doesn't bark!") == [
        "a", "man", "'s", "dog", ",", "-lrb-", "brown", "-rrb-", "does", "n't",
        "bark", "!",
    ]


def test_ptb_tokenizer_golden_corpus():
    """Golden outputs hand-derived from CoreNLP PTBTokenizer semantics with the
    coco-caption flags (-preserveLines -lowerCase, then the PUNCTUATIONS drop —
    reference eval/tokenizer/ptbtokenizer.py:42-113): contraction clitics,
    n't/ca n't/wo n't, possessives (singular and plural), quotes, hyphenated
    words kept whole, numeric commas/colons/currency per the Penn Treebank WSJ
    conventions, CoreNLP assimilation splitting, bracket/dash/ellipsis drops."""
    from on_device_image_captioning_tpu.evalcap.tokenizer import tokenize_captions

    golden = [
        ("A man is riding a horse.", "a man is riding a horse"),
        ("The dog doesn't catch the frisbee.",
         "the dog does n't catch the frisbee"),
        ("He can't see the ball, so he waits.",
         "he ca n't see the ball so he waits"),
        ("She won't jump.", "she wo n't jump"),
        ("It's a sunny day; people are out.",
         "it 's a sunny day people are out"),
        ("I'm happy we're here and they've left.",
         "i 'm happy we 're here and they 've left"),
        ("We'll see what she'd do.", "we 'll see what she 'd do"),
        # the plural-possessive quote splits off and is then dropped (it is in
        # the coco-caption PUNCTUATIONS list)
        ("The dog's ball and the dogs' toys.",
         "the dog 's ball and the dogs toys"),
        ('"A large pizza" on a table', "a large pizza on a table"),
        # reference quirk preserved: the jar's -lowerCase emits "-lrb-" but the
        # PUNCTUATIONS drop list is uppercase "-LRB-", so bracket tokens SURVIVE
        # into scored text (reference eval/tokenizer/ptbtokenizer.py:53,107-108)
        ("A well-dressed man stands (near a tree).",
         "a well-dressed man stands -lrb- near a tree -rrb-"),
        ("There are 1,000 people.", "there are 1,000 people"),
        ("It costs $5 at 5:30 today.", "it costs $ 5 at 5:30 today"),
        ("A sign says 50% off...", "a sign says 50 % off"),
        ("He cannot skate; he's gonna fall.",
         "he can not skate he 's gon na fall"),
        ("Wait -- a cat and a dog!", "wait a cat and a dog"),
        ("Two cats, one dog, and a bird.", "two cats one dog and a bird"),
        ("a man rides a bike", "a man rides a bike"),
        ("'hello' said the sign", "hello said the sign"),
    ]
    gts = {i: [{"caption": raw}] for i, (raw, _) in enumerate(golden)}
    got = tokenize_captions(gts)
    for i, (raw, expect) in enumerate(golden):
        assert got[i][0] == expect, f"{raw!r}: {got[i][0]!r} != {expect!r}"


def test_harness_end_to_end(corpus):
    gts, res = corpus
    preds = {i: res[i][0] for i in res}
    refs = {i: gts[i] for i in gts}
    scores = evaluate_captions(preds, refs)
    for key in ["Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"]:
        assert key in scores and 0 <= scores[key] <= 10
    # perfect predictions give BLEU 1.0
    perfect = evaluate_captions(
        {i: refs[i][0] for i in refs}, refs, metrics=("bleu", "rouge")
    )
    np.testing.assert_allclose(perfect["Bleu_1"], 1.0, atol=1e-6)
    np.testing.assert_allclose(perfect["ROUGE_L"], 1.0, atol=1e-6)


def test_scst_reward_pipeline():
    from on_device_image_captioning_tpu.data.text import Vocab
    from on_device_image_captioning_tpu.train.scst import CiderReward

    vocab = Vocab.build(["a cat sits", "a dog runs", "a red ball"], 1)
    refs = [["a cat sits", "a cat sits down"], ["a dog runs"], ["a red ball"]]
    reward = CiderReward(refs)
    sos, eos = vocab.sos_idx, vocab.eos_idx
    cap = vocab.encode("a cat sits".split()) + [eos]
    toks = np.full((1, 2, 8), vocab.pad_idx, np.int64)
    toks[0, :, 0] = sos
    toks[0, 0, 1 : 1 + len(cap)] = cap
    toks[0, 1, 1] = eos  # empty caption
    lengths = np.array([[len(cap), 1]])
    r = reward(toks, lengths, [0], vocab)
    assert r.shape == (1, 2)
    assert r[0, 0] > r[0, 1]  # matching caption outscores empty
