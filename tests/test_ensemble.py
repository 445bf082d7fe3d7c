"""Ensemble decode parity: softmax-probability averaging across model states must
reproduce the reference EsembleCaptioningModel's beam captions."""
import numpy as np
import pytest

import jax

from on_device_image_captioning_tpu.config import CaptionerConfig, DecodeConfig
from on_device_image_captioning_tpu.decode import beam_search as bs
from on_device_image_captioning_tpu.models import captioner as cap
from on_device_image_captioning_tpu.params import torch_convert as tc

TINY = CaptionerConfig(
    d_model=32, N_enc=2, N_dec=2, ff=64, num_heads=4, num_exp_enc_list=(4, 8),
    num_exp_dec=4, vocab_size=50, max_seq_len=24, img_feature_dim=24,
    sos_idx=2, eos_idx=3, pad_idx=0, unk_idx=1,
)


def _make_ref_model(reference_path, seed):
    import torch
    from argparse import Namespace
    from models.ExpansionNet_v2 import ExpansionNet_v2

    torch.manual_seed(seed)
    drop = Namespace(enc=0.0, dec=0.0, enc_input=0.0, dec_input=0.0, other=0.0)
    m = ExpansionNet_v2(
        d_model=TINY.d_model, N_enc=TINY.N_enc, N_dec=TINY.N_dec, ff=TINY.ff,
        num_heads=TINY.num_heads, num_exp_enc_list=list(TINY.num_exp_enc_list),
        num_exp_dec=TINY.num_exp_dec,
        output_word2idx={f"w{i}": i for i in range(TINY.vocab_size)},
        output_idx2word=[f"w{i}" for i in range(TINY.vocab_size)],
        max_seq_len=TINY.max_seq_len, drop_args=drop,
        img_feature_dim=TINY.img_feature_dim, rank="cpu",
    )
    m.eval()
    return m


def test_ensemble_beam_parity(reference_path):
    import torch
    from models.ensemble_captioning_model import EsembleCaptioningModel

    # the reference features-in model's forward_dec needs the 5-arg signature the
    # ensemble calls (cross, enc_pads, dec, dec_pads, False) — it has it.
    models = [_make_ref_model(reference_path, s) for s in (0, 1)]
    ens = EsembleCaptioningModel(models, rank="cpu")

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((2, 7, TINY.img_feature_dim), dtype=np.float32)
    with torch.no_grad():
        ref_caps, _ = ens(
            torch.from_numpy(feats), enc_x_num_pads=[0, 0], mode="beam_search",
            sos_idx=TINY.sos_idx, eos_idx=TINY.eos_idx, beam_size=3,
            how_many_outputs=1, beam_max_seq_len=16,
        )

    params_list = [
        tc.to_jax(tc.convert_captioner(tc.strip_prefixes(m.state_dict()), TINY))
        for m in models
    ]
    encs = [cap.forward_enc(p, TINY, feats) for p in params_list]
    dcfg = DecodeConfig(
        beam_size=3, how_many_outputs=1, max_seq_len=16,
        sos_idx=TINY.sos_idx, eos_idx=TINY.eos_idx,
    )
    res = jax.jit(
        lambda ps, es: bs.ensemble_beam_search(ps, TINY, es, dcfg)
    )(params_list, encs)
    got_caps, _ = bs.captions_from_result(res)
    assert got_caps == ref_caps


def test_single_model_beam_unchanged_after_refactor(reference_path):
    """Regression guard: the beam_loop refactor keeps single-model parity."""
    import torch
    from models.captioning_model import Captioner

    model = _make_ref_model(reference_path, 9)

    class RefCaptioner(Captioner):
        def forward_enc(self, enc_input, enc_input_num_pads):
            return self.model.forward_enc(enc_input, enc_input_num_pads)

        def forward_dec(
            self, cross_input, enc_input_num_pads, dec_input, dec_input_num_pads
        ):
            return self.model.forward_dec(
                cross_input, enc_input_num_pads, dec_input, dec_input_num_pads,
                apply_log_softmax=True,
            )

    rng = np.random.default_rng(5)
    feats = rng.standard_normal((2, 6, TINY.img_feature_dim), dtype=np.float32)
    beam_args = {"sos_idx": 2, "eos_idx": 3, "beam_size": 4,
                 "how_many_outputs": 2, "beam_max_seq_len": 14}
    with torch.no_grad():
        ref_caps, _ = RefCaptioner(beam_args, model=model)(
            torch.from_numpy(feats), enc_x_num_pads=[0, 0], mode="beam_search"
        )
    params = tc.to_jax(tc.convert_captioner(tc.strip_prefixes(model.state_dict()), TINY))
    enc = cap.forward_enc(params, TINY, feats)
    res = bs.beam_search(
        params, TINY, enc,
        DecodeConfig(beam_size=4, how_many_outputs=2, max_seq_len=14,
                     sos_idx=2, eos_idx=3),
    )
    got_caps, _ = bs.captions_from_result(res)
    assert got_caps == ref_caps
