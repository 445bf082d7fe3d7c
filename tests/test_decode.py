"""Decode engine tests: incremental-state exactness, beam-search parity with the
reference implementation, sampling bookkeeping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from on_device_image_captioning_tpu.config import CaptionerConfig, DecodeConfig
from on_device_image_captioning_tpu.decode import beam_search as bs
from on_device_image_captioning_tpu.decode import cache as dc
from on_device_image_captioning_tpu.decode import sampling
from on_device_image_captioning_tpu.models import captioner as cap

TINY = CaptionerConfig(
    d_model=32,
    N_enc=2,
    N_dec=2,
    ff=64,
    num_heads=4,
    num_exp_enc_list=(4, 8),
    num_exp_dec=4,
    vocab_size=50,
    max_seq_len=20,
    img_feature_dim=24,
    sos_idx=2,
    eos_idx=3,
    pad_idx=0,
    unk_idx=1,
)


@pytest.fixture(scope="module")
def tiny_params():
    return cap.captioner_init(jax.random.PRNGKey(0), TINY)


def test_incremental_matches_full(tiny_params):
    """dec_step chained over a prefix must equal the full forward_dec logits at
    every position — the exactness claim of decode/cache.py."""
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 7, TINY.img_feature_dim), dtype=np.float32)
    tokens = rng.integers(0, TINY.vocab_size, size=(2, 9)).astype(np.int32)

    cross = cap.forward_enc(tiny_params, TINY, feats)
    full = cap.forward_dec(tiny_params, TINY, cross, tokens, apply_log_softmax=True)

    state = dc.init_state(tiny_params, TINY, cross, max_len=tokens.shape[1])
    for t in range(tokens.shape[1]):
        step_lp, state = dc.dec_step(
            tiny_params, TINY, state, jnp.asarray(tokens[:, t]), jnp.int32(t)
        )
        np.testing.assert_allclose(
            np.asarray(step_lp), np.asarray(full[:, t]), rtol=2e-5, atol=2e-5,
            err_msg=f"position {t}",
        )


def _ref_captioner(reference_path, torch_model, beam_args):
    from models.captioning_model import Captioner

    class RefCaptioner(Captioner):
        def forward_enc(self, enc_input, enc_input_num_pads):
            return self.model.forward_enc(enc_input, enc_input_num_pads)

        def forward_dec(
            self, cross_input, enc_input_num_pads, dec_input, dec_input_num_pads
        ):
            return self.model.forward_dec(
                cross_input,
                enc_input_num_pads,
                dec_input,
                dec_input_num_pads,
                apply_log_softmax=True,
            )

    return RefCaptioner(beam_args, model=torch_model)


@pytest.mark.parametrize("beam_size,max_len", [(3, 12), (5, 16)])
def test_beam_search_parity(reference_path, beam_size, max_len):
    """JAX beam search must reproduce the reference's captions token-for-token on
    a tiny model with shared random weights."""
    import torch
    from argparse import Namespace
    from models.ExpansionNet_v2 import ExpansionNet_v2

    from on_device_image_captioning_tpu.params import torch_convert as tc

    torch.manual_seed(3)
    drop = Namespace(enc=0.0, dec=0.0, enc_input=0.0, dec_input=0.0, other=0.0)
    ref = ExpansionNet_v2(
        d_model=TINY.d_model, N_enc=TINY.N_enc, N_dec=TINY.N_dec, ff=TINY.ff,
        num_heads=TINY.num_heads, num_exp_enc_list=list(TINY.num_exp_enc_list),
        num_exp_dec=TINY.num_exp_dec,
        output_word2idx={f"w{i}": i for i in range(TINY.vocab_size)},
        output_idx2word=[f"w{i}" for i in range(TINY.vocab_size)],
        max_seq_len=TINY.max_seq_len, drop_args=drop,
        img_feature_dim=TINY.img_feature_dim, rank="cpu",
    )
    ref.eval()
    sos, eos = 2, 3
    beam_args = {"sos_idx": sos, "eos_idx": eos, "beam_size": beam_size,
                 "how_many_outputs": beam_size, "beam_max_seq_len": max_len}
    captioner = _ref_captioner(reference_path, ref, beam_args)

    rng = np.random.default_rng(11)
    feats = rng.standard_normal((3, 7, TINY.img_feature_dim), dtype=np.float32)
    with torch.no_grad():
        ref_caps, ref_lps = captioner(
            torch.from_numpy(feats), enc_x_num_pads=[0, 0, 0], mode="beam_search"
        )

    params = tc.to_jax(tc.convert_captioner(tc.strip_prefixes(ref.state_dict()), TINY))
    cross = cap.forward_enc(params, TINY, feats)
    dcfg = DecodeConfig(
        beam_size=beam_size, how_many_outputs=beam_size, max_seq_len=max_len,
        sos_idx=sos, eos_idx=eos,
    )
    res = jax.jit(
        lambda p, c: bs.beam_search(p, TINY, c, dcfg)
    )(params, cross)
    got_caps, got_lps = bs.captions_from_result(res)

    assert got_caps == ref_caps
    # per-step logprobs agree on the kept tokens
    for i in range(len(ref_caps)):
        for j in range(len(ref_caps[i])):
            ref_row = ref_lps[i][j][: len(got_lps[i][j])].numpy()
            np.testing.assert_allclose(got_lps[i][j], ref_row, rtol=1e-4, atol=1e-4)


def test_beam_padded_features_match_unpadded(tiny_params):
    """Decoding a batch whose feature rows carry trailing pad junk (with
    enc_num_pads set) must caption identically to decoding the truncated,
    unpadded features — the invariance the reference gets by threading enc
    masks through beam search (reference models/captioning_model.py:239-281)."""
    rng = np.random.default_rng(7)
    s_valid = 6
    feats = rng.standard_normal((2, s_valid, TINY.img_feature_dim), dtype=np.float32)
    junk = 100.0 * rng.standard_normal((2, 4, TINY.img_feature_dim), dtype=np.float32)
    padded = np.concatenate([feats, junk], axis=1)  # (2, 10, F)
    pads = jnp.asarray([4, 4], jnp.int32)

    dcfg = DecodeConfig(beam_size=3, how_many_outputs=3, max_seq_len=14,
                        sos_idx=2, eos_idx=3)

    cross = cap.forward_enc(tiny_params, TINY, feats)
    base = bs.beam_search(tiny_params, TINY, cross, dcfg)
    base_caps, base_lps = bs.captions_from_result(base)

    cross_p = cap.forward_enc(tiny_params, TINY, padded, enc_num_pads=pads)
    got = jax.jit(
        lambda p, c, n: bs.beam_search(p, TINY, c, dcfg, enc_num_pads=n)
    )(tiny_params, cross_p, pads)
    got_caps, got_lps = bs.captions_from_result(got)

    assert got_caps == base_caps
    for i in range(2):
        for j in range(3):
            np.testing.assert_allclose(got_lps[i][j], base_lps[i][j],
                                       rtol=1e-5, atol=1e-5)


def test_beam_search_parity_heterogeneous_pads(reference_path):
    """Token-for-token beam parity vs the reference on a batch of
    heterogeneous-length feature rows (enc_x_num_pads=[0, 2, 4]) — the padded
    feature-store path (reference data/coco_dataloader.py:437-478)."""
    import torch
    from argparse import Namespace
    from models.ExpansionNet_v2 import ExpansionNet_v2

    from on_device_image_captioning_tpu.params import torch_convert as tc

    torch.manual_seed(9)
    drop = Namespace(enc=0.0, dec=0.0, enc_input=0.0, dec_input=0.0, other=0.0)
    ref = ExpansionNet_v2(
        d_model=TINY.d_model, N_enc=TINY.N_enc, N_dec=TINY.N_dec, ff=TINY.ff,
        num_heads=TINY.num_heads, num_exp_enc_list=list(TINY.num_exp_enc_list),
        num_exp_dec=TINY.num_exp_dec,
        output_word2idx={f"w{i}": i for i in range(TINY.vocab_size)},
        output_idx2word=[f"w{i}" for i in range(TINY.vocab_size)],
        max_seq_len=TINY.max_seq_len, drop_args=drop,
        img_feature_dim=TINY.img_feature_dim, rank="cpu",
    )
    ref.eval()
    sos, eos, beam_size, max_len = 2, 3, 3, 12
    pads = [0, 2, 4]
    captioner = _ref_captioner(
        reference_path, ref,
        {"sos_idx": sos, "eos_idx": eos, "beam_size": beam_size,
         "how_many_outputs": beam_size, "beam_max_seq_len": max_len},
    )

    rng = np.random.default_rng(13)
    feats = rng.standard_normal((3, 9, TINY.img_feature_dim), dtype=np.float32)
    with torch.no_grad():
        ref_caps, _ = captioner(
            torch.from_numpy(feats), enc_x_num_pads=pads, mode="beam_search"
        )

    params = tc.to_jax(tc.convert_captioner(tc.strip_prefixes(ref.state_dict()), TINY))
    pads_j = jnp.asarray(pads, jnp.int32)
    cross = cap.forward_enc(params, TINY, feats, enc_num_pads=pads_j)
    dcfg = DecodeConfig(
        beam_size=beam_size, how_many_outputs=beam_size, max_seq_len=max_len,
        sos_idx=sos, eos_idx=eos,
    )
    res = jax.jit(
        lambda p, c, n: bs.beam_search(p, TINY, c, dcfg, enc_num_pads=n)
    )(params, cross, pads_j)
    got_caps, _ = bs.captions_from_result(res)
    assert got_caps == ref_caps


def test_sampling_bookkeeping(tiny_params):
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((2, 7, TINY.img_feature_dim), dtype=np.float32)
    cross = cap.forward_enc(tiny_params, TINY, feats)
    res = sampling.sample(
        tiny_params, TINY, cross, num_outputs=3, max_seq_len=10,
        rng=jax.random.PRNGKey(0), sos_idx=2, eos_idx=3,
    )
    assert res.tokens.shape == (2, 3, 11)
    caps = sampling.captions_from_result(res)
    toks = np.asarray(res.tokens).reshape(6, 11)
    lps = np.asarray(res.logprobs).reshape(6, 11)
    lengths = np.asarray(res.lengths).reshape(6)
    assert (toks[:, 0] == 2).all()
    for r in range(6):
        # length points at first EOS (or max_len when none sampled)
        if 3 in toks[r, 1:].tolist():
            first = 1 + toks[r, 1:].tolist().index(3)
            assert lengths[r] == first
            assert (lps[r, first + 1 :] == 0).all()
        else:
            assert lengths[r] == 10
        assert caps[r // 3][r % 3] == toks[r, : lengths[r] + 1].tolist()
    # logprob of SOS position is 0
    assert (lps[:, 0] == 0).all()


@pytest.mark.parametrize("chunks", [None, (6, 12, 18), (4, 18)])
def test_sampling_chunked_matches_single_phase(tiny_params, chunks):
    """Chunked sampling (short-cache early phases, beam_search._grow_caches
    between while_loops) must reproduce the single-phase decode: identical
    tokens/lengths, logprobs equal up to fp reduction order (contractions
    span the cache length, so XLA groups the same nonzero terms
    differently)."""
    rng = np.random.default_rng(9)
    feats = rng.standard_normal((2, 7, TINY.img_feature_dim), dtype=np.float32)
    cross = cap.forward_enc(tiny_params, TINY, feats)
    kw = dict(num_outputs=3, max_seq_len=18, rng=jax.random.PRNGKey(0),
              sos_idx=2, eos_idx=3)
    base = sampling.sample(tiny_params, TINY, cross, chunks=(18,), **kw)
    got = sampling.sample(tiny_params, TINY, cross, chunks=chunks, **kw)
    assert np.array_equal(np.asarray(base.tokens), np.asarray(got.tokens))
    assert np.array_equal(np.asarray(base.lengths), np.asarray(got.lengths))
    np.testing.assert_allclose(
        np.asarray(base.logprobs), np.asarray(got.logprobs), atol=1e-5
    )


@pytest.mark.parametrize("seed,dyn_impl", [
    (21, "xla"), (22, "xla"), (23, "xla"), (24, "xla"),
    # the fused Pallas decode-step kernel must ALSO hold token-for-token beam
    # parity (its reduction order differs from XLA; the bench runs it by
    # default, so beam-tie robustness is load-bearing)
    (21, "pallas"),
])
def test_beam_search_parity_fuzz(reference_path, seed, dyn_impl):
    """Fuzz: random tiny models + random beam/eos configs must stay
    token-for-token identical to the reference beam search."""
    import torch
    from argparse import Namespace
    from models.ExpansionNet_v2 import ExpansionNet_v2

    from on_device_image_captioning_tpu.params import torch_convert as tc

    rng = np.random.default_rng(seed)
    torch.manual_seed(seed)
    cfg = CaptionerConfig(
        d_model=16 * int(rng.integers(1, 3)),
        N_enc=int(rng.integers(1, 3)),
        N_dec=int(rng.integers(1, 3)),
        ff=32, num_heads=4,
        num_exp_enc_list=(int(rng.integers(2, 5)), int(rng.integers(4, 9))),
        num_exp_dec=int(rng.integers(2, 6)),
        vocab_size=int(rng.integers(20, 60)),
        max_seq_len=24, img_feature_dim=int(rng.integers(8, 25)),
        sos_idx=2, eos_idx=3, pad_idx=0, unk_idx=1,
    )
    drop = Namespace(enc=0.0, dec=0.0, enc_input=0.0, dec_input=0.0, other=0.0)
    ref = ExpansionNet_v2(
        d_model=cfg.d_model, N_enc=cfg.N_enc, N_dec=cfg.N_dec, ff=cfg.ff,
        num_heads=cfg.num_heads, num_exp_enc_list=list(cfg.num_exp_enc_list),
        num_exp_dec=cfg.num_exp_dec,
        output_word2idx={f"w{i}": i for i in range(cfg.vocab_size)},
        output_idx2word=[f"w{i}" for i in range(cfg.vocab_size)],
        max_seq_len=cfg.max_seq_len, drop_args=drop,
        img_feature_dim=cfg.img_feature_dim, rank="cpu",
    )
    ref.eval()
    sos = int(rng.integers(0, cfg.vocab_size))
    eos = int(rng.integers(0, cfg.vocab_size))
    beam = int(rng.integers(2, 6))
    max_len = int(rng.integers(6, 20))
    captioner = _ref_captioner(
        reference_path, ref,
        {"sos_idx": sos, "eos_idx": eos, "beam_size": beam,
         "how_many_outputs": 1, "beam_max_seq_len": max_len},
    )
    feats = rng.standard_normal((2, 5, cfg.img_feature_dim), dtype=np.float32)
    with torch.no_grad():
        ref_caps, _ = captioner(
            torch.from_numpy(feats), enc_x_num_pads=[0, 0], mode="beam_search"
        )
    params = tc.to_jax(tc.convert_captioner(tc.strip_prefixes(ref.state_dict()), cfg))
    cross = cap.forward_enc(params, cfg, feats)
    dc.set_dyn_step_impl(dyn_impl)
    try:
        res = bs.beam_search(
            params, cfg, cross,
            DecodeConfig(beam_size=beam, how_many_outputs=1, max_seq_len=max_len,
                         sos_idx=sos, eos_idx=eos),
        )
        got_caps, _ = bs.captions_from_result(res)
    finally:
        dc.set_dyn_step_impl("xla")
    assert got_caps == ref_caps, (seed, sos, eos, beam, max_len, dyn_impl)


@pytest.mark.parametrize("dyn_impl", ["xla", "pallas"])
def test_chunked_beam_parity(tiny_params, dyn_impl):
    """Chunked decode (growing cache-length schedule) must be token-identical
    to a single full-length phase — positions beyond `pos` are masked, so the
    cache length is only a step budget. Exercises both step impls (the Pallas
    one also covers the double-buffered ping-pong across phase boundaries).
    Logprobs agree up to fp32 reduction order: contractions span the padded
    cache length, so XLA groups the (identical) nonzero terms differently."""
    import dataclasses

    rng = np.random.default_rng(7)
    feats = rng.standard_normal((3, 7, TINY.img_feature_dim), dtype=np.float32)
    cross = cap.forward_enc(tiny_params, TINY, feats)
    base = DecodeConfig(
        beam_size=3, how_many_outputs=3, max_seq_len=17, sos_idx=2, eos_idx=3,
        chunk_schedule=(17,),
    )
    chunked = dataclasses.replace(base, chunk_schedule=(6, 10, 17))
    dc.set_dyn_step_impl(dyn_impl)
    try:
        r0 = jax.jit(lambda p, c: bs.beam_search(p, TINY, c, base))(
            tiny_params, cross
        )
        r1 = jax.jit(lambda p, c: bs.beam_search(p, TINY, c, chunked))(
            tiny_params, cross
        )
    finally:
        dc.set_dyn_step_impl("xla")
    caps0, lps0 = bs.captions_from_result(r0)
    caps1, lps1 = bs.captions_from_result(r1)
    assert caps0 == caps1
    np.testing.assert_allclose(
        np.concatenate([np.concatenate(r) for r in lps0]),
        np.concatenate([np.concatenate(r) for r in lps1]),
        rtol=2e-5, atol=2e-5,
    )


def test_default_chunk_schedule():
    # short budgets get a (12, L) two-phase (measured 15.5 -> 13.5 ms at
    # b32/beam3/L20: dyn-step cache traffic scales with current cache length)
    assert bs.default_chunk_schedule(16) == (16,)
    assert bs.default_chunk_schedule(20) == (12, 20)
    assert bs.default_chunk_schedule(32) == (12, 32)
    # long budgets ramp densely: 12, 24, then +16 per phase (round-4 sweep:
    # (12,24,40,56,74) beats the former doubled (24,48,74) by ~5% at both
    # the no-EOS and typical-EOS eval workloads)
    assert bs.default_chunk_schedule(74) == (12, 24, 40, 56, 74)
    # a chunk within 8 of the budget merges into the final phase
    # (no near-degenerate 96 -> 100 phase paying a whole compile for 4 steps)
    assert bs.default_chunk_schedule(100) == (12, 24, 40, 56, 72, 88, 100)
    assert bs.default_chunk_schedule(64) == (12, 24, 40, 64)
    # non-final chunks always even (double-buffer phase-handoff requirement)
    for L in range(33, 200, 7):
        sched = bs.default_chunk_schedule(L)
        assert sched[-1] == L and all(c % 2 == 0 for c in sched[:-1])
        assert tuple(sorted(set(sched))) == sched
        # no phase adds fewer than 9 steps over its predecessor
        assert all(b - a > 8 for a, b in zip(sched, sched[1:]))
    # `first` is honored consistently across budget regimes (ADVICE r4: the
    # short-budget branch hardcoded 12, so first=16 only applied at long L)
    assert bs.default_chunk_schedule(20, first=16) == (20,)
    assert bs.default_chunk_schedule(24, first=16) == (16, 24)
    assert bs.default_chunk_schedule(74, first=16)[0] == 16
    # odd `first` rounds up to even (non-final chunks must be even)
    assert bs.default_chunk_schedule(74, first=11)[0] == 12


@pytest.mark.parametrize("chunks", [None, (6, 10, 17)])
def test_double_buffer_parity(tiny_params, chunks):
    """ADVICE r2: the double_buffer=True two-step body (fixed-role A/B
    donation) must produce identical tokens to the plain one-step body, on
    the same inputs, under the Pallas step impl."""
    import dataclasses

    rng = np.random.default_rng(13)
    feats = rng.standard_normal((2, 6, TINY.img_feature_dim), dtype=np.float32)
    cross = cap.forward_enc(tiny_params, TINY, feats)
    dcfg = DecodeConfig(
        beam_size=3, how_many_outputs=3, max_seq_len=17, sos_idx=2, eos_idx=3,
        chunk_schedule=chunks,
    )
    if chunks is None:
        dcfg = dataclasses.replace(dcfg, chunk_schedule=(17,))
    dc.set_dyn_step_impl("pallas")
    try:
        r_db = jax.jit(
            lambda p, c: bs.beam_search(p, TINY, c, dcfg, double_buffer=True)
        )(tiny_params, cross)
        r_nb = jax.jit(
            lambda p, c: bs.beam_search(p, TINY, c, dcfg, double_buffer=False)
        )(tiny_params, cross)
    finally:
        dc.set_dyn_step_impl("xla")
    caps_db, _ = bs.captions_from_result(r_db)
    caps_nb, _ = bs.captions_from_result(r_nb)
    assert caps_db == caps_nb


def test_step_vmem_eligibility_constants():
    """The scoped-VMEM footprint model must flag the shape that crashed the
    round-5 SCST run (fp32 caches, 57-slot chunk of a max_seq_len-74
    sampling decode: Mosaic reported 16.25M vs the 16.00M limit) while
    keeping every round-4 production config eligible."""
    from on_device_image_captioning_tpu.ops.dyn_exp_step import (
        step_eligible, step_scoped_vmem_bytes,
    )

    assert not step_eligible(57, 16, 512, 4)
    # the model reproduces the compiler's report within ~1%
    assert abs(step_scoped_vmem_bytes(57, 16, 512, 4) - 16.25 * 2**20) < (
        0.2 * 2**20
    )
    assert step_eligible(41, 16, 512, 4)  # f32 sampling, 40-token chunk
    assert step_eligible(21, 16, 512, 4)  # round-4 SCST at max_seq_len 20
    assert step_eligible(75, 16, 512, 2, dst=True)  # bf16 beam eval at L74
    assert not step_eligible(75, 16, 512, 4)  # f32 full-L74 sampling chunk


def test_dyn_step_vmem_fallback_matches_pallas(tiny_params, monkeypatch):
    """When step_eligible rejects a cache shape, _dyn_exp_step must route to
    the XLA incremental step (pre-gathering the fused beam reorder itself)
    and produce the same captions as the Pallas kernel."""
    from on_device_image_captioning_tpu.ops import dyn_exp_step as ds

    rng = np.random.default_rng(11)
    feats = rng.standard_normal((3, 7, TINY.img_feature_dim), dtype=np.float32)
    cross = cap.forward_enc(tiny_params, TINY, feats)
    dcfg = DecodeConfig(
        beam_size=3, how_many_outputs=3, max_seq_len=17, sos_idx=2, eos_idx=3,
        chunk_schedule=(6, 17),
    )
    dc.set_dyn_step_impl("pallas")
    try:
        r_pl = jax.jit(lambda p, c: bs.beam_search(p, TINY, c, dcfg))(
            tiny_params, cross
        )
        monkeypatch.setattr(ds, "step_eligible", lambda *a, **k: False)
        r_fb = jax.jit(lambda p, c: bs.beam_search(p, TINY, c, dcfg))(
            tiny_params, cross
        )
    finally:
        dc.set_dyn_step_impl("xla")
    caps_pl, _ = bs.captions_from_result(r_pl)
    caps_fb, _ = bs.captions_from_result(r_fb)
    assert caps_pl == caps_fb

    # sampling (in_place, no reorder) through the same fallback
    key = jax.random.PRNGKey(3)
    skw = dict(
        num_outputs=2, max_seq_len=17, rng=key, sos_idx=2, eos_idx=3,
        chunks=(6, 17),
    )
    monkeypatch.undo()  # restore the real step_eligible for the pallas run
    dc.set_dyn_step_impl("pallas")
    try:
        r_s_pl = jax.jit(
            lambda p, c: sampling.sample(p, TINY, c, **skw)
        )(tiny_params, cross)
        monkeypatch.setattr(ds, "step_eligible", lambda *a, **k: False)
        r_s = jax.jit(
            lambda p, c, _pad=None: sampling.sample(p, TINY, c, **skw)
        )(tiny_params, cross)
    finally:
        dc.set_dyn_step_impl("xla")
        monkeypatch.undo()
    assert np.asarray(r_s.tokens).tolist() == np.asarray(
        r_s_pl.tokens
    ).tolist()
