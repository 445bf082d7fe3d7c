"""System test: the training stack actually learns.

Overfit the features-in model on a tiny synthetic corpus with RAdam + the
label-smoothing loss, then beam-decode the training inputs — the captioner must
reproduce its training captions. Exercises optimizer, schedule, loss, teacher
forcing, and decode as one system (the reference has no such test; its only
validation is full-dataset training)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from on_device_image_captioning_tpu.config import CaptionerConfig, DecodeConfig
from on_device_image_captioning_tpu.data.text import Vocab, pad_batch
from on_device_image_captioning_tpu.decode import beam_search as bs
from on_device_image_captioning_tpu.models import captioner as cap
from on_device_image_captioning_tpu.train import radam, train_step


def test_overfit_tiny_corpus_and_reproduce_captions():
    vocab = Vocab.build(
        ["a red ball", "a blue cat", "the green dog", "a small bird"], 1
    )
    cfg = CaptionerConfig(
        d_model=48, N_enc=1, N_dec=1, ff=96, num_heads=4, num_exp_enc_list=(4,),
        num_exp_dec=4, vocab_size=len(vocab), max_seq_len=12, img_feature_dim=8,
        sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx, pad_idx=vocab.pad_idx,
        unk_idx=vocab.unk_idx,
    )
    rng = np.random.default_rng(0)
    n = 4
    feats = rng.standard_normal((n, 5, cfg.img_feature_dim), dtype=np.float32)
    captions = ["a red ball", "a blue cat", "the green dog", "a small bird"]
    encoded, _ = pad_batch(
        [vocab.encode_caption(c) for c in captions], vocab.pad_idx
    )
    batch = {
        "enc_input": jnp.asarray(feats),
        "captions": jnp.asarray(encoded, jnp.int32),
    }

    params = cap.captioner_init(jax.random.PRNGKey(0), cfg)
    opt = radam.radam(2e-3, b1=0.9, b2=0.98, eps=1e-9)
    step_fn = train_step.make_xe_step(cfg, opt, end_to_end_model=False)
    state = train_step.init_train_state(params, opt)

    # run all 300 steps in one jitted fori_loop (ONE compile, no per-step
    # Python dispatch — this box is 1-core and both compiles and per-call
    # overhead dominated the test)
    @jax.jit
    def train300(state):
        def body(i, carry):
            st, first = carry
            st, m = step_fn(st, batch, jax.random.fold_in(jax.random.PRNGKey(0), i))
            first = jnp.where(i == 0, m["loss"], first)
            return st, first
        (state, first) = jax.lax.fori_loop(0, 299, body, (state, jnp.inf))
        state, m = step_fn(state, batch, jax.random.PRNGKey(299))
        return state, first, m["loss"]

    state, first, last = train300(state)
    first, last = float(first), float(last)
    assert last < first * 0.3, (first, last)

    enc = cap.forward_enc(state.params, cfg, feats)
    res = bs.beam_search(
        state.params, cfg, enc,
        DecodeConfig(beam_size=3, how_many_outputs=1, max_seq_len=12,
                     sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx),
    )
    caps, _ = bs.captions_from_result(res)
    decoded = [vocab.description(row[0]).lower().rstrip(".") for row in caps]
    # the overfit model reproduces most training captions verbatim
    hits = sum(d == c for d, c in zip(decoded, captions))
    assert hits >= 3, decoded


def test_scst_increases_reward():
    """SCST system test: sampling -> CIDEr reward -> REINFORCE gradient raises the
    mean reward on a tiny corpus (the full phase-5 loop in miniature)."""
    from on_device_image_captioning_tpu.decode import sampling
    from on_device_image_captioning_tpu.train.scst import CiderReward

    vocab = Vocab.build(["a red ball", "a blue cat", "a green dog"], 1)
    cfg = CaptionerConfig(
        d_model=48, N_enc=1, N_dec=1, ff=96, num_heads=4, num_exp_enc_list=(4,),
        num_exp_dec=4, vocab_size=len(vocab), max_seq_len=10, img_feature_dim=8,
        sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx, pad_idx=vocab.pad_idx,
        unk_idx=vocab.unk_idx,
    )
    rng = np.random.default_rng(1)
    n = 3
    feats = rng.standard_normal((n, 5, cfg.img_feature_dim), dtype=np.float32)
    refs = [["a red ball"], ["a blue cat"], ["a green dog"]]

    # brief XE warmup so sampling isn't uniform noise
    encoded, _ = pad_batch(
        [vocab.encode_caption(r[0]) for r in refs], vocab.pad_idx
    )
    batch = {
        "enc_input": jnp.asarray(feats),
        "captions": jnp.asarray(encoded, jnp.int32),
    }
    params = cap.captioner_init(jax.random.PRNGKey(1), cfg)
    warm_opt = optax.adam(2e-3)
    warm = jax.jit(train_step.make_xe_step(cfg, warm_opt, end_to_end_model=False))
    state = train_step.init_train_state(params, warm_opt)
    for i in range(60):
        state, _ = warm(state, batch, jax.random.PRNGKey(i))

    reward_fn = CiderReward(refs)
    num_samples = 4
    opt = optax.adam(5e-4)
    scst = jax.jit(
        train_step.make_scst_step(cfg, opt, end_to_end_model=False,
                                  num_samples=num_samples)
    )
    state = train_step.init_train_state(state.params, opt)

    sample_jit = jax.jit(
        lambda p, f, r: sampling.sample(
            p, cfg, cap.forward_enc(p, cfg, f), num_samples, 8, r,
            vocab.sos_idx, vocab.eos_idx,
        )
    )
    rewards_log = []
    key = jax.random.PRNGKey(7)
    for i in range(30):
        key, sub = jax.random.split(key)
        sampled = sample_jit(state.params, jnp.asarray(feats), sub)
        rewards = reward_fn(
            np.asarray(sampled.tokens), np.asarray(sampled.lengths),
            list(range(n)), vocab,
        )
        state, metrics = scst(
            state, {"enc_input": jnp.asarray(feats)},
            {"tokens": sampled.tokens, "lengths": sampled.lengths},
            jnp.asarray(rewards),
        )
        rewards_log.append(float(rewards.mean()))
    early = np.mean(rewards_log[:5])
    late = np.mean(rewards_log[-5:])
    assert late > early, (early, late)


def test_scst_rescore_reproduces_sampling_logprobs():
    """The SCST default (rng=None re-score) must grade the sampled captions
    under the SAME policy that produced them: the teacher-forced re-score's
    per-caption logprob sums equal the sampling decode's, even when the
    config carries nonzero dropout rates (rng=None keeps dropout off; the
    --scst_dropout CLI flag is what opts into the noisy draw). This is the
    estimator-exactness contract documented in train_step.make_scst_step."""
    from on_device_image_captioning_tpu.config import DropConfig
    from on_device_image_captioning_tpu.decode import sampling

    vocab = Vocab.build(["a red ball", "a blue cat", "a green dog"], 1)
    cfg = CaptionerConfig(
        d_model=48, N_enc=1, N_dec=1, ff=96, num_heads=4, num_exp_enc_list=(4,),
        num_exp_dec=4, vocab_size=len(vocab), max_seq_len=10, img_feature_dim=8,
        sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx, pad_idx=vocab.pad_idx,
        unk_idx=vocab.unk_idx,
        drop=DropConfig(enc=0.3, dec=0.3, enc_input=0.2, dec_input=0.2, other=0.1),
    )
    rng = np.random.default_rng(5)
    n, num_samples = 3, 4
    feats = jnp.asarray(
        rng.standard_normal((n, 5, cfg.img_feature_dim), dtype=np.float32)
    )
    params = cap.captioner_init(jax.random.PRNGKey(2), cfg)
    enc = cap.forward_enc(params, cfg, feats)
    sampled = sampling.sample(
        params, cfg, enc, num_samples, 8, jax.random.PRNGKey(9),
        vocab.sos_idx, vocab.eos_idx,
    )

    opt = optax.adam(1e-4)
    scst = jax.jit(
        train_step.make_scst_step(cfg, opt, end_to_end_model=False,
                                  num_samples=num_samples)
    )
    state = train_step.init_train_state(params, opt)
    rewards = jnp.asarray(rng.random((n, num_samples)), jnp.float32)
    _, metrics = scst(
        state, {"enc_input": feats},
        {"tokens": sampled.tokens, "lengths": sampled.lengths},
        rewards, None,
    )
    # sampling zeros logprobs after the first EOS; the re-score keeps
    # positions < length. Both sums cover exactly the generated tokens.
    want = float(np.asarray(sampled.logprobs).sum(-1).mean())
    got = float(metrics["logprob_sum"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # and with a dropout rng (the --scst_dropout path) the re-score is a
    # DIFFERENT draw: logprobs must move, proving rng=None was load-bearing
    _, noisy = scst(
        state, {"enc_input": feats},
        {"tokens": sampled.tokens, "lengths": sampled.lengths},
        rewards, jax.random.PRNGKey(3),
    )
    assert abs(float(noisy["logprob_sum"]) - want) > 1e-3


def test_scst_fused_step_matches_two_phase():
    """make_scst_fused_step (shared encoder forward, in-jit reward) must be
    the SAME estimator as the two-phase flow (sample, then make_scst_step):
    with dropout off, one encoder forward under jax.vjp replaces the two
    forwards, so sampled tokens, rewards, metrics, and the updated params
    all match the two-phase step that re-scores the same captions."""
    from on_device_image_captioning_tpu.decode import sampling

    vocab = Vocab.build(["a red ball", "a blue cat", "a green dog"], 1)
    cfg = CaptionerConfig(
        d_model=48, N_enc=1, N_dec=1, ff=96, num_heads=4, num_exp_enc_list=(4,),
        num_exp_dec=4, vocab_size=len(vocab), max_seq_len=10, img_feature_dim=8,
        sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx, pad_idx=vocab.pad_idx,
        unk_idx=vocab.unk_idx,
    )
    rng = np.random.default_rng(3)
    n, num_samples, L = 3, 4, 8
    feats = jnp.asarray(
        rng.standard_normal((n, 5, cfg.img_feature_dim), dtype=np.float32)
    )
    params = cap.captioner_init(jax.random.PRNGKey(4), cfg)
    opt = optax.adam(5e-4)
    state = train_step.init_train_state(params, opt)

    # deterministic tokens-only reward so both flows score identically
    def reward_fn(tokens, lengths, ref_tables):
        return (tokens[:, :, 1:].sum(-1) % 5).astype(jnp.float32) - 2.0

    fused = jax.jit(
        train_step.make_scst_fused_step(
            cfg, opt, end_to_end_model=False, num_samples=num_samples,
            scst_max_len=L, sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx,
            reward_fn=reward_fn,
        )
    )
    key = jax.random.PRNGKey(11)
    state_f, metrics_f = fused(state, {"enc_input": feats}, None, key)

    # two-phase reference: sample from the SAME train-mode encoder forward
    # (fused runs the encoder with train=True; rng=None keeps dropout off)
    enc = cap.forward_enc(params, cfg, feats, train=True)
    sampled = sampling.sample(
        params, cfg, enc, num_samples, L, key, vocab.sos_idx, vocab.eos_idx
    )
    rewards = reward_fn(sampled.tokens, sampled.lengths, None)
    scst = jax.jit(
        train_step.make_scst_step(cfg, opt, end_to_end_model=False,
                                  num_samples=num_samples)
    )
    state_t, metrics_t = scst(
        state, {"enc_input": feats},
        {"tokens": sampled.tokens, "lengths": sampled.lengths}, rewards, None,
    )

    for k in ("loss", "reward", "baseline", "logprob_sum"):
        np.testing.assert_allclose(
            float(metrics_f[k]), float(metrics_t[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )
    flat_f = jax.tree.leaves(state_f.params)
    flat_t = jax.tree.leaves(state_t.params)
    for a, b in zip(flat_f, flat_t):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_scst_fused_step_end_to_end_smoke():
    """Fused SCST over the full image model: one step runs, params move, and
    the swin backbone receives nonzero gradient through the shared-forward
    vjp (the encoder path the decoder-only grad cannot reach)."""
    from on_device_image_captioning_tpu.config import ModelConfig, SwinConfig
    from on_device_image_captioning_tpu.models import end_to_end

    vocab = Vocab.build(["a red ball", "a blue cat"], 1)
    cfg = ModelConfig(
        swin=SwinConfig(img_size=32, patch_size=4, embed_dim=16, depths=(2,),
                        num_heads=(2,), window_size=4),
        captioner=CaptionerConfig(
            d_model=32, N_enc=1, N_dec=1, ff=64, num_heads=4,
            num_exp_enc_list=(4,), num_exp_dec=4, vocab_size=len(vocab),
            max_seq_len=10, img_feature_dim=16,
            sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx,
            pad_idx=vocab.pad_idx, unk_idx=vocab.unk_idx,
        ),
    )
    params = end_to_end.init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    state = train_step.init_train_state(params, opt)

    def reward_fn(tokens, lengths, ref_tables):
        return (tokens[:, :, 1:].sum(-1) % 3).astype(jnp.float32) - 1.0

    fused = jax.jit(
        train_step.make_scst_fused_step(
            cfg, opt, end_to_end_model=True, num_samples=3, scst_max_len=8,
            sos_idx=vocab.sos_idx, eos_idx=vocab.eos_idx, reward_fn=reward_fn,
        )
    )
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    state2, metrics = fused(state, {"enc_input": imgs}, None,
                            jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))
    moved = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(state.params["swin"]),
            jax.tree.leaves(state2.params["swin"]),
        )
    ]
    assert max(moved) > 0.0, "swin params did not move: encoder vjp broken"
