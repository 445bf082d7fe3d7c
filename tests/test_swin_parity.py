"""Numerical parity of the JAX Swin backbone against the reference on CPU with
shared random weights (tiny configuration: 2 stages exercises shifted windows,
patch merging, and the window==resolution degenerate stage)."""
import numpy as np
import pytest

from on_device_image_captioning_tpu.config import SwinConfig
from on_device_image_captioning_tpu.models import swin
from on_device_image_captioning_tpu.params import torch_convert

TINY = SwinConfig(
    img_size=32,
    patch_size=4,
    in_chans=3,
    embed_dim=16,
    depths=(2, 2),
    num_heads=(2, 4),
    window_size=4,
    drop_path_rate=0.0,
)


@pytest.fixture(scope="module")
def ref_swin(reference_path):
    import torch
    import torch.nn as nn
    from models.swin_transformer_mod import SwinTransformer

    torch.manual_seed(0)
    model = SwinTransformer(
        img_size=TINY.img_size,
        patch_size=TINY.patch_size,
        in_chans=TINY.in_chans,
        embed_dim=TINY.embed_dim,
        depths=list(TINY.depths),
        num_heads=list(TINY.num_heads),
        window_size=TINY.window_size,
        mlp_ratio=TINY.mlp_ratio,
        qkv_bias=True,
        qk_scale=None,
        drop_rate=0.0,
        attn_drop_rate=0.0,
        drop_path_rate=0.0,
        norm_layer=nn.LayerNorm,
        ape=False,
        patch_norm=True,
        use_checkpoint=False,
        rank="cpu",
    )
    model.eval()
    return model


def test_swin_forward_matches(ref_swin):
    import torch

    sd = torch_convert.strip_prefixes(ref_swin.state_dict())
    params = torch_convert.to_jax(torch_convert.convert_swin(sd, TINY, prefix=""))

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, TINY.img_size, TINY.img_size), dtype=np.float32)
    with torch.no_grad():
        ref = ref_swin(torch.from_numpy(imgs)).numpy()
    # JAX path is NHWC
    got = np.asarray(swin.swin_apply(params, TINY, imgs.transpose(0, 2, 3, 1)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_swin_large_output_shape():
    """Swin-L/384 emits (B, 144, 1536) visual tokens (reference SURVEY §0)."""
    cfg = SwinConfig()
    assert cfg.num_features == 1536
    assert cfg.stage_resolution(3) == (12, 12)


def test_swin_scan_stage_matches_reference(reference_path):
    """Stages deep enough to take the lax.scan path (depth >= 4) must still match
    the reference elementwise."""
    import torch
    import torch.nn as nn
    from models.swin_transformer_mod import SwinTransformer

    cfg = SwinConfig(
        img_size=32, patch_size=4, in_chans=3, embed_dim=8, depths=(6, 2),
        num_heads=(2, 4), window_size=4,
    )
    torch.manual_seed(1)
    ref = SwinTransformer(
        img_size=32, patch_size=4, in_chans=3, embed_dim=8, depths=[6, 2],
        num_heads=[2, 4], window_size=4, mlp_ratio=4.0, qkv_bias=True,
        qk_scale=None, drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        norm_layer=nn.LayerNorm, ape=False, patch_norm=True,
        use_checkpoint=False, rank="cpu",
    )
    ref.eval()
    sd = torch_convert.strip_prefixes(ref.state_dict())
    params = torch_convert.to_jax(torch_convert.convert_swin(sd, cfg, prefix=""))
    rng = np.random.default_rng(3)
    imgs = rng.standard_normal((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(imgs)).numpy()
    got = np.asarray(swin.swin_apply(params, cfg, imgs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_window_transition_perm_matches_relayout_chain():
    """The composed-permutation gather used by the window-resident stages
    (models/swin.py window_transition_perm) must equal the explicit
    reverse -> roll -> partition chain for every (from_shift, to_shift) pair
    the stages use."""
    import itertools

    import jax.numpy as jnp

    res, window = 24, 12
    n = window * window
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, res, res, 8), dtype=np.float32))

    def layout(xs, shift):
        rolled = jnp.roll(xs, (-shift, -shift), axis=(1, 2)) if shift else xs
        return swin._window_partition(rolled, window)

    def unlayout(w, shift):
        xs = swin._window_reverse(w, window, res, res)
        return jnp.roll(xs, (shift, shift), axis=(1, 2)) if shift else xs

    for f, t in itertools.product([0, window // 2], repeat=2):
        if f == t:
            continue
        src = layout(x, f)
        want = layout(unlayout(src, f), t)
        got = swin._window_transition(src, 2, res, window, f, t)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_prepare_inference_params_bit_identical():
    """prepare_inference_params pre-expands each block's rel-pos bias into
    `rel_bias_x`; outputs must be BIT-identical to the per-call gather path
    for both attention impls (the expansion runs the same take/reshape/
    transpose the forward would, just once)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32)
    for impl in ("xla", "fused"):
        cfg = dataclasses.replace(TINY, attention_impl=impl)
        params = swin.swin_init(jax.random.PRNGKey(0), cfg)
        prep = swin.prepare_inference_params(params, cfg)
        # original tree untouched; every block gained exactly one key
        for st, stp in zip(params["stages"], prep["stages"]):
            for bp, bpp in zip(st["blocks"], stp["blocks"]):
                assert "rel_bias_x" not in bp["attn"]
                assert set(bpp["attn"]) == set(bp["attn"]) | {"rel_bias_x"}
        a = swin.swin_apply(params, cfg, jnp.asarray(x), dtype=jnp.float32)
        b = swin.swin_apply(prep, cfg, jnp.asarray(x), dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
