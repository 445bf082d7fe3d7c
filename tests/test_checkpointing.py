"""Checkpoint rotation/resume and parameter surgery tests."""
import os

import jax
import numpy as np
import optax

from on_device_image_captioning_tpu.config import CaptionerConfig
from on_device_image_captioning_tpu.models import captioner as cap
from on_device_image_captioning_tpu.params import surgery
from on_device_image_captioning_tpu.utils import checkpointing as ckpt

TINY = CaptionerConfig(
    d_model=16, N_enc=3, N_dec=3, ff=32, num_heads=2, num_exp_enc_list=(2, 4),
    num_exp_dec=2, vocab_size=20, max_seq_len=10, img_feature_dim=8,
    sos_idx=2, eos_idx=3, pad_idx=0, unk_idx=1,
)


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    params = cap.captioner_init(jax.random.PRNGKey(0), TINY)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    loader_state = {"batch_it": 7, "epoch_it": 1, "batch_size": 4,
                    "array_of_init_seed": [1, 2]}

    paths = []
    for i in range(4):
        paths.append(
            ckpt.save_checkpoint(
                str(tmp_path), params, opt_state, step=i,
                data_loader_state=loader_state, additional_info="xe",
                num_max_checkpoints=3, epoch_it=1, batch_it=7, batch_size=4,
            )
        )
    files = [f for f in os.listdir(tmp_path) if f.startswith("checkpoint_")]
    assert len(files) == 3  # rotation keeps newest 3
    assert not os.path.exists(paths[0])

    template = {"params": params, "opt_state": opt_state}
    payload, info = ckpt.load_most_recent(str(tmp_path), template)
    assert info == "xe"
    assert payload["step"] == 3
    assert payload["data_loader_state"]["batch_it"] == 7
    for (pa, a), (pb, b) in zip(
        surgery.flatten_with_paths(payload["params"]),
        surgery.flatten_with_paths(params),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_load():
    p1 = cap.captioner_init(jax.random.PRNGKey(0), TINY)
    p2 = cap.captioner_init(jax.random.PRNGKey(1), TINY)
    # copy only encoder subtree from p1 into p2
    merged = surgery.partially_load(p2, {"encoders": p1["encoders"]})
    np.testing.assert_array_equal(
        merged["encoders"][0]["stc_exp"]["key_embed"]["w"],
        np.asarray(p1["encoders"][0]["stc_exp"]["key_embed"]["w"]),
    )
    np.testing.assert_array_equal(
        merged["vocab_linear"]["w"], np.asarray(p2["vocab_linear"]["w"])
    )


def test_remove_layer_surgery():
    import dataclasses

    params = cap.captioner_init(jax.random.PRNGKey(0), TINY)
    d = TINY.d_model

    p1 = surgery.remove_layer(params, 1)
    assert len(p1["encoders"]) == 2 and len(p1["decoders"]) == 3
    assert p1["enc_reduce_group"]["w"].shape == (2 * d, d)
    # kept chunks are [first, last] of the original three
    w = np.asarray(params["enc_reduce_group"]["w"])
    np.testing.assert_array_equal(p1["enc_reduce_group"]["w"][:d], w[:d])
    np.testing.assert_array_equal(p1["enc_reduce_group"]["w"][d:], w[2 * d :])
    # layer 2 moved into slot 1
    np.testing.assert_array_equal(
        np.asarray(p1["encoders"][1]["ff"]["linear_1"]["w"]),
        np.asarray(params["encoders"][2]["ff"]["linear_1"]["w"]),
    )

    p2 = surgery.remove_layer(params, 2)
    assert len(p2["encoders"]) == 2 and len(p2["decoders"]) == 2
    assert p2["dec_reduce_group"]["w"].shape == (2 * d, d)

    # surgically removed params run under the reduced config
    cfg1 = dataclasses.replace(TINY, N_enc=2, N_dec=2)
    feats = np.zeros((1, 5, TINY.img_feature_dim), np.float32)
    toks = np.zeros((1, 4), np.int32)
    out = cap.forward(p2, cfg1, feats, toks)
    assert out.shape == (1, 4, TINY.vocab_size)
