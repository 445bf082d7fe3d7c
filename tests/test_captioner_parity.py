"""Numerical parity of the JAX caption head against the reference PyTorch model.

Strategy: build the reference `ExpansionNet_v2` (features-in) on CPU with random
weights, convert its state_dict via params/torch_convert, and compare
forward_enc / forward_dec outputs elementwise. This substitutes for golden
checkpoints (none are shipped in the snapshot — .MISSING_LARGE_BLOBS).
"""
import numpy as np
import pytest

from on_device_image_captioning_tpu.config import CaptionerConfig, DropConfig
from on_device_image_captioning_tpu.models import captioner as cap
from on_device_image_captioning_tpu.params import torch_convert

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
    drop=DropConfig(),
)


@pytest.fixture(scope="module")
def ref_model(reference_path):
    import torch
    from argparse import Namespace
    from models.ExpansionNet_v2 import ExpansionNet_v2

    torch.manual_seed(0)
    word2idx = {f"w{i}": i for i in range(TINY.vocab_size)}
    idx2word = [f"w{i}" for i in range(TINY.vocab_size)]
    drop = Namespace(enc=0.0, dec=0.0, enc_input=0.0, dec_input=0.0, other=0.0)
    model = ExpansionNet_v2(
        d_model=TINY.d_model,
        N_enc=TINY.N_enc,
        N_dec=TINY.N_dec,
        ff=TINY.ff,
        num_heads=TINY.num_heads,
        num_exp_enc_list=list(TINY.num_exp_enc_list),
        num_exp_dec=TINY.num_exp_dec,
        output_word2idx=word2idx,
        output_idx2word=idx2word,
        max_seq_len=TINY.max_seq_len,
        drop_args=drop,
        img_feature_dim=TINY.img_feature_dim,
        rank="cpu",
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params(ref_model):
    sd = torch_convert.strip_prefixes(ref_model.state_dict())
    return torch_convert.to_jax(torch_convert.convert_captioner(sd, TINY))


def test_forward_enc_matches(ref_model, jax_params):
    import torch

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 7, TINY.img_feature_dim), dtype=np.float32)
    with torch.no_grad():
        ref = ref_model.forward_enc(torch.from_numpy(feats), [0, 0]).numpy()
    got = np.asarray(cap.forward_enc(jax_params, TINY, feats))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_forward_enc_with_pads_matches(ref_model, jax_params):
    import torch

    rng = np.random.default_rng(2)
    feats = rng.standard_normal((3, 9, TINY.img_feature_dim), dtype=np.float32)
    pads = [0, 3, 5]
    with torch.no_grad():
        ref = ref_model.forward_enc(torch.from_numpy(feats), pads).numpy()
    got = np.asarray(
        cap.forward_enc(jax_params, TINY, feats, enc_num_pads=np.asarray(pads))
    )
    # padded tail positions may differ (reference normalizes them too); compare the
    # real positions per row
    for b, p in enumerate(pads):
        valid = feats.shape[1] - p
        np.testing.assert_allclose(
            got[b, :valid], ref[b, :valid], rtol=2e-5, atol=2e-5
        )


def test_forward_dec_matches(ref_model, jax_params):
    import torch

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 7, TINY.img_feature_dim), dtype=np.float32)
    tokens = rng.integers(0, TINY.vocab_size, size=(2, 6))
    with torch.no_grad():
        cross = ref_model.forward_enc(torch.from_numpy(feats), [0, 0])
        ref = ref_model.forward_dec(
            cross, [0, 0], torch.from_numpy(tokens), [0, 0], apply_log_softmax=True
        ).numpy()
    cross_j = cap.forward_enc(jax_params, TINY, feats)
    got = np.asarray(
        cap.forward_dec(
            jax_params, TINY, cross_j, tokens.astype(np.int32), apply_log_softmax=True
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_forward_dec_with_pads_matches(ref_model, jax_params):
    import torch

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((3, 7, TINY.img_feature_dim), dtype=np.float32)
    tokens = rng.integers(0, TINY.vocab_size, size=(3, 8))
    pads = [0, 2, 4]
    with torch.no_grad():
        cross = ref_model.forward_enc(torch.from_numpy(feats), [0, 0, 0])
        ref = ref_model.forward_dec(
            cross, [0, 0, 0], torch.from_numpy(tokens), pads, apply_log_softmax=True
        ).numpy()
    cross_j = cap.forward_enc(jax_params, TINY, feats)
    got = np.asarray(
        cap.forward_dec(
            jax_params,
            TINY,
            cross_j,
            tokens.astype(np.int32),
            dec_num_pads=np.asarray(pads),
            apply_log_softmax=True,
        )
    )
    for b, p in enumerate(pads):
        valid = tokens.shape[1] - p
        np.testing.assert_allclose(
            got[b, :valid], ref[b, :valid], rtol=2e-5, atol=2e-5
        )
