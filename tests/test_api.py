"""High-level Captioner API tests: mode dispatch, split halves, ensemble."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from on_device_image_captioning_tpu.api import Captioner, EnsembleCaptioner
from on_device_image_captioning_tpu.config import CaptionerConfig
from on_device_image_captioning_tpu.models import captioner as cap_mod

TINY = CaptionerConfig(
    d_model=32, N_enc=2, N_dec=2, ff=64, num_heads=4, num_exp_enc_list=(4, 8),
    num_exp_dec=4, vocab_size=50, max_seq_len=20, img_feature_dim=24,
    sos_idx=2, eos_idx=3, pad_idx=0, unk_idx=1,
)


@pytest.fixture(scope="module")
def captioner():
    params = cap_mod.captioner_init(jax.random.PRNGKey(0), TINY)
    return Captioner(
        params, TINY,
        beam_search_args={"beam_size": 3, "how_many_outputs": 2,
                          "beam_max_seq_len": 12, "sample_max_seq_len": 8},
    )


@pytest.fixture(scope="module")
def feats():
    return np.random.default_rng(0).standard_normal(
        (2, 7, TINY.img_feature_dim), dtype=np.float32
    )


def test_mode_forward(captioner, feats):
    toks = np.zeros((2, 5), np.int32)
    out = captioner(feats, dec_x=toks, mode="forward")
    assert out.shape == (2, 5, TINY.vocab_size)
    np.testing.assert_allclose(
        float(jax.scipy.special.logsumexp(out[0, 0])), 0.0, atol=1e-5
    )


def test_mode_beam_search(captioner, feats):
    caps, lps = captioner(feats, mode="beam_search")
    assert len(caps) == 2 and len(caps[0]) == 2
    assert all(c[0] == TINY.sos_idx for row in caps for c in row)


def test_mode_sampling(captioner, feats):
    caps, lps = captioner(feats, mode="sampling", rng=jax.random.PRNGKey(1))
    assert len(caps) == 2 and len(caps[0]) == 2


def test_split_halves_consistent(captioner, feats):
    """The split-encoder surface equals the fused call
    (reference End_ExpansionNet_v2_Encoder/Decoder semantics)."""
    cross = captioner.forward_enc(feats)
    toks = np.ones((2, 4), np.int32)
    split = captioner.forward_dec(cross, toks, apply_log_softmax=True)
    fused = captioner(feats, dec_x=toks, mode="forward")
    np.testing.assert_allclose(np.asarray(split), np.asarray(fused), atol=1e-6)


def test_unknown_mode_raises(captioner, feats):
    with pytest.raises(ValueError):
        captioner(feats, mode="???")


def test_ensemble_api(feats):
    caps1 = Captioner(
        cap_mod.captioner_init(jax.random.PRNGKey(0), TINY), TINY,
        {"beam_size": 2, "beam_max_seq_len": 10},
    )
    caps2 = Captioner(
        cap_mod.captioner_init(jax.random.PRNGKey(1), TINY), TINY,
        {"beam_size": 2, "beam_max_seq_len": 10},
    )
    ens = EnsembleCaptioner([caps1, caps2])
    caps, lps = ens(feats)
    assert len(caps) == 2
    assert caps[0][0][0] == TINY.sos_idx


def test_captioner_end_to_end_model():
    """The mode-dispatch API over the full end-to-end (image-input) model."""
    from on_device_image_captioning_tpu.config import ModelConfig, SwinConfig
    from on_device_image_captioning_tpu.models import end_to_end

    import dataclasses

    cfg = ModelConfig(
        swin=SwinConfig(img_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
                        num_heads=(2, 4), window_size=4),
        captioner=dataclasses.replace(TINY, img_feature_dim=32),
    )
    params = end_to_end.init(jax.random.PRNGKey(0), cfg)
    c = Captioner(params, cfg, {"beam_size": 2, "beam_max_seq_len": 8,
                                "sample_max_seq_len": 6, "how_many_outputs": 2})
    imgs = np.random.default_rng(0).standard_normal((2, 32, 32, 3),
                                                    dtype=np.float32)
    caps, _ = c(imgs, mode="beam_search")
    assert len(caps) == 2 and caps[0][0][0] == 2
    toks = np.zeros((2, 4), np.int32)
    out = c(imgs, dec_x=toks, mode="forward")
    assert out.shape == (2, 4, 50)
    caps, _ = c(imgs, mode="sampling", rng=jax.random.PRNGKey(1))
    assert len(caps[0]) == 2
