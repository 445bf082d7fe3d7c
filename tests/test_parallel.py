"""Parallelism tests on the 4-device virtual CPU mesh: sharded-batch inference
equals single-device results, TP-sharded params keep the forward exact, and the
sharding rules hit the intended weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from on_device_image_captioning_tpu.config import CaptionerConfig, DecodeConfig
from on_device_image_captioning_tpu.decode import beam_search as bs
from on_device_image_captioning_tpu.models import captioner as cap
from on_device_image_captioning_tpu.parallel import mesh as pm

TINY = CaptionerConfig(
    d_model=32, N_enc=2, N_dec=2, ff=64, num_heads=4, num_exp_enc_list=(4, 8),
    num_exp_dec=4, vocab_size=48, max_seq_len=16, img_feature_dim=24,
    sos_idx=2, eos_idx=3, pad_idx=0, unk_idx=1,
)


@pytest.fixture(scope="module")
def setup():
    params = cap.captioner_init(jax.random.PRNGKey(0), TINY)
    feats = np.random.default_rng(0).standard_normal(
        (8, 7, TINY.img_feature_dim), dtype=np.float32
    )
    return params, feats


def test_dp_sharded_beam_decode_matches_single_device(setup):
    """The serving path under pure data parallelism: batch sharded on the 'data'
    axis across 4 devices must caption identically to one device."""
    params, feats = setup
    dcfg = DecodeConfig(beam_size=3, how_many_outputs=1, max_seq_len=12,
                        sos_idx=2, eos_idx=3)

    def decode(params, feats):
        enc = cap.forward_enc(params, TINY, feats)
        res = bs.beam_search(params, TINY, enc, dcfg)
        return res.tokens, res.lengths

    base_toks, base_lens = jax.jit(decode)(params, jnp.asarray(feats))

    mesh = pm.make_mesh(n_data=4, n_model=1)
    params_sh = pm.shard_params(params, mesh)
    feats_sh = jax.device_put(
        jnp.asarray(feats), NamedSharding(mesh, P("data", None, None))
    )
    toks, lens = jax.jit(decode)(params_sh, feats_sh)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(base_toks))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(base_lens))


def test_tp_sharded_forward_exact(setup):
    """Megatron-style TP on FFN/vocab weights must not change the forward."""
    params, feats = setup
    toks = np.random.default_rng(1).integers(0, TINY.vocab_size, (8, 5)).astype(
        np.int32
    )

    def fwd(params, feats, toks):
        return cap.forward(params, TINY, feats, toks, apply_log_softmax=True)

    base = jax.jit(fwd)(params, jnp.asarray(feats), jnp.asarray(toks))

    mesh = pm.make_mesh(n_data=2, n_model=2)
    params_sh = pm.shard_params(params, mesh)
    batch = pm.shard_batch({"f": jnp.asarray(feats), "t": jnp.asarray(toks)}, mesh)
    got = jax.jit(fwd)(params_sh, batch["f"], batch["t"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=2e-5,
                               atol=2e-5)


def test_dp_sharded_fused_scst_step_matches_single_device(setup):
    """The fused SCST step (sampling + device CIDEr-D + REINFORCE grad +
    optimizer in one jit — what cli/train.py --reinforce --device_reward
    runs) under a 4-way DP mesh must match the single-device step: identical
    sampled rewards, and updated params equal up to the gradient psum's
    reduction order."""
    from on_device_image_captioning_tpu.data.text import (
        EOS_TOKEN, PAD_TOKEN, SOS_TOKEN, UNK_TOKEN, Vocab,
    )
    from on_device_image_captioning_tpu.train import radam, train_step
    from on_device_image_captioning_tpu.train.device_cider import (
        DeviceCiderCorpus,
    )

    params, feats = setup
    words = [PAD_TOKEN, UNK_TOKEN, SOS_TOKEN, EOS_TOKEN] + [
        f"w{i}" for i in range(12)
    ]
    vocab = Vocab(word2idx={w: i for i, w in enumerate(words)})
    refs = [["w0 w1 w2", "w1 w2 w3"], ["w5 w6", "w6 w7 w8"],
            ["w2 w4 w6", "w0 w9"], ["w10 w11", "w3 w5 w7"]]
    dcorpus = DeviceCiderCorpus(refs, vocab)

    opt = radam.radam(lambda _: 1e-3, b1=0.9, b2=0.98, eps=1e-9)
    step = jax.jit(
        train_step.make_scst_fused_step(
            TINY, opt, end_to_end_model=False, num_samples=2, scst_max_len=10,
            sos_idx=TINY.sos_idx, eos_idx=TINY.eos_idx,
            reward_fn=dcorpus.make_reward_fn(),
        )
    )
    img_idx = np.arange(feats.shape[0]) % len(refs)
    tables = {k: jnp.asarray(v) for k, v in dcorpus.batch(img_idx).items()}
    batch = {"enc_input": jnp.asarray(feats)}
    rng = jax.random.PRNGKey(5)

    state = train_step.init_train_state(params, opt)
    base_state, base_m = step(state, batch, tables, rng)

    mesh = pm.make_mesh(n_data=4, n_model=1)
    st_sh = pm.shard_train_state(train_step.init_train_state(params, opt), mesh)
    got_state, got_m = step(
        st_sh, pm.shard_batch(batch, mesh), pm.shard_batch(tables, mesh), rng
    )
    # per-row sampling/reward math is untouched by DP sharding
    np.testing.assert_allclose(
        float(got_m["reward"]), float(base_m["reward"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(got_m["loss"]), float(base_m["loss"]), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(base_state.params),
                    jax.tree.leaves(got_state.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-6
        )


def test_make_default_mesh_divides_batch():
    """The CLI-facing mesh constructor uses as many devices as evenly divide the
    batch (4 virtual devices in this suite)."""
    assert pm.make_default_mesh(8).shape == {"data": 4, "model": 1}
    assert pm.make_default_mesh(12).shape["data"] == 4  # gcd(12, 4)
    assert pm.make_default_mesh(7).shape["data"] == 1
    assert pm.make_default_mesh(8, n_model=2).shape == {"data": 2, "model": 2}


def test_shard_train_state_places_params_and_moments(setup):
    """shard_train_state must give optimizer moments the same PartitionSpecs as
    their parameters and replicate scalar counters."""
    from jax.sharding import NamedSharding

    from on_device_image_captioning_tpu.train import radam, train_step

    params, _ = setup
    opt = train_step.with_grad_accum(
        radam.radam(lambda _: 1e-4, b1=0.9, b2=0.98, eps=1e-9), num_accum=2
    )
    state = train_step.init_train_state(params, opt)
    mesh = pm.make_mesh(n_data=2, n_model=2)
    st = pm.shard_train_state(state, mesh)

    def spec_of(x):
        return x.sharding.spec

    # TP rule on params
    assert spec_of(st.params["decoders"][0]["ff"]["linear_1"]["w"]) == P(None, "model")
    # every leaf is committed to THIS mesh
    for leaf in jax.tree.leaves(st):
        assert isinstance(leaf.sharding, NamedSharding)
        assert leaf.sharding.mesh == mesh
    # moments mirror the param specs: find a params-shaped subtree in opt_state
    tp_shape = st.params["decoders"][0]["ff"]["linear_1"]["w"].shape
    moment_specs = [
        spec_of(leaf)
        for leaf in jax.tree.leaves(st.opt_state)
        if getattr(leaf, "shape", None) == tp_shape
    ]
    assert moment_specs and all(s == P(None, "model") for s in moment_specs)
    # scalar counters replicated
    assert spec_of(st.step) == P()

    # the sharded state runs a full XE step (numerical sharding-invariance of
    # the forward is covered by test_tp_sharded_forward_exact)
    feats = np.random.default_rng(3).standard_normal(
        (8, 7, TINY.img_feature_dim), dtype=np.float32
    )
    toks = np.random.default_rng(4).integers(0, TINY.vocab_size, (8, 6)).astype(
        np.int32
    )
    step = jax.jit(train_step.make_xe_step(TINY, opt, end_to_end_model=False))
    batch = pm.shard_batch(
        {"enc_input": jnp.asarray(feats), "captions": jnp.asarray(toks)}, mesh
    )
    st2, m_shard = step(st, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m_shard["loss"]))
    assert int(st2.step) == 1


def test_param_specs_hit_tp_targets(setup):
    params, _ = setup
    specs = pm.param_specs(params)
    assert specs["decoders"][0]["ff"]["linear_1"]["w"] == P(None, "model")
    assert specs["decoders"][0]["ff"]["linear_2"]["w"] == P("model", None)
    assert specs["vocab_linear"]["w"] == P(None, "model")
    assert specs["out_embedder"]["embed"] == P("model", None)
    # everything else replicated
    assert specs["enc_reduce_norm"]["scale"] == P()
    assert specs["decoders"][0]["mha"]["Wq"]["w"] == P()
