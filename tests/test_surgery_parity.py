"""Layer-removal surgery parity: our pytree surgery must produce the same
2-layer model the reference's load_state_dict_filtered builds
(reference train.py:305-342)."""
import numpy as np
import pytest

from on_device_image_captioning_tpu.config import CaptionerConfig
from on_device_image_captioning_tpu.params import surgery
from on_device_image_captioning_tpu.params import torch_convert as tc

TINY3 = CaptionerConfig(
    d_model=32, N_enc=3, N_dec=3, ff=64, num_heads=4, num_exp_enc_list=(4, 8),
    num_exp_dec=4, vocab_size=50, max_seq_len=20, img_feature_dim=24,
    sos_idx=2, eos_idx=3, pad_idx=0, unk_idx=1,
)


def _ref_model(reference_path, n_enc, n_dec, seed):
    import torch
    from argparse import Namespace
    from models.ExpansionNet_v2 import ExpansionNet_v2

    torch.manual_seed(seed)
    drop = Namespace(enc=0.0, dec=0.0, enc_input=0.0, dec_input=0.0, other=0.0)
    m = ExpansionNet_v2(
        d_model=TINY3.d_model, N_enc=n_enc, N_dec=n_dec, ff=TINY3.ff,
        num_heads=TINY3.num_heads, num_exp_enc_list=list(TINY3.num_exp_enc_list),
        num_exp_dec=TINY3.num_exp_dec,
        output_word2idx={f"w{i}": i for i in range(TINY3.vocab_size)},
        output_idx2word=[f"w{i}" for i in range(TINY3.vocab_size)],
        max_seq_len=TINY3.max_seq_len, drop_args=drop,
        img_feature_dim=TINY3.img_feature_dim, rank="cpu",
    )
    m.eval()
    return m


def test_remove_layer_matches_reference_filter(reference_path):
    """Apply the reference's filtered loader (encoder+decoder removal) to a
    reference 2/2-layer model, and our remove_layer to the converted pytree of
    the same 3/3-layer source — results must agree on every shared tensor."""
    import dataclasses
    import torch
    import sys
    import types

    sys.path.insert(0, str(reference_path))
    # the reference's train.py transitively imports torchvision (absent in this
    # environment); stub the pieces its import-time code touches
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.SimpleNamespace(
            Resize=lambda *a, **k: None,
            Normalize=lambda *a, **k: None,
            Compose=lambda *a, **k: None,
            ToTensor=lambda *a, **k: None,
        )
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms  # type: ignore
    import importlib

    train_mod = importlib.import_module("train")

    src = _ref_model(reference_path, 3, 3, seed=0)
    dst = _ref_model(reference_path, 2, 2, seed=1)
    ckpt = {"model_state_dict": src.state_dict()}
    # filter_prefixes='dec' removes one encoder AND one decoder layer
    # (reference train.py:374-379 param_config 2)
    train_mod.load_state_dict_filtered(dst, ckpt, filter_prefixes="dec")

    cfg2 = dataclasses.replace(TINY3, N_enc=2, N_dec=2)
    ref2 = tc.convert_captioner(tc.strip_prefixes(dst.state_dict()), cfg2)

    src_params = tc.convert_captioner(tc.strip_prefixes(src.state_dict()), TINY3)
    ours2 = surgery.remove_layer(src_params, 2)

    flat_ref = dict(surgery.flatten_with_paths(ref2))
    flat_ours = dict(surgery.flatten_with_paths(ours2))
    assert set(flat_ref) == set(flat_ours)
    for path in flat_ref:
        np.testing.assert_array_equal(
            np.asarray(flat_ours[path]), np.asarray(flat_ref[path]), err_msg=path
        )
