"""Fused stage-boundary kernels (ops/stage_boundary.py): the window-resident
inference backbone must match the XLA boundary path (patch_embed /
patch_merging / window partition+reverse) elementwise — bit-identically in
bf16, since the kernels' merge step picks rows exactly (one-hot MXU dots) and
the LN/GEMM numerics mirror the XLA ops (fp32 stats/accumulation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from on_device_image_captioning_tpu.config import SwinConfig
from on_device_image_captioning_tpu.models import swin
from on_device_image_captioning_tpu.ops import stage_boundary as sb

CFG = SwinConfig(
    img_size=64, patch_size=4, in_chans=3, embed_dim=16, depths=(2, 2, 2),
    num_heads=(2, 4, 8), window_size=4, drop_path_rate=0.0,
    attention_impl="fused",
)


@pytest.fixture(scope="module")
def params():
    return swin.swin_init(jax.random.PRNGKey(0), CFG)


@pytest.fixture(autouse=True)
def _restore_impl():
    yield
    sb.set_boundary_impl("kernel")


def test_patch_embed_fused_matches_xla(params):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    x_ref = swin.patch_embed(params["patch_embed"], CFG, imgs, None)
    xw_ref = swin._window_partition(x_ref.reshape(2, 16, 16, 16), 4)
    b, h, w, cin = imgs.shape
    ps = CFG.patch_size
    x_s2d = (
        imgs.reshape(b, h // ps, ps, w // ps, ps, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // ps, w // ps, ps * ps * cin)
    )
    got = sb.patch_embed_fused(
        x_s2d, params["patch_embed"]["proj"], params["patch_embed"]["norm"],
        4, CFG.ln_eps,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(xw_ref), rtol=2e-6, atol=2e-6
    )


def test_downsample_fused_matches_patch_merging(params):
    ds = params["stages"][0]["downsample"]
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((2, 256, 16), dtype=np.float32))
    y_ref = swin.patch_merging(ds, CFG, xs, 0, None)
    yw_ref = swin._window_partition(y_ref.reshape(2, 8, 8, 32), 4)
    xw = swin._window_partition(xs.reshape(2, 16, 16, 16), 4)
    got = sb.downsample_fused(xw, ds["norm"], ds["reduction"], 4, 4, CFG.ln_eps)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(yw_ref), rtol=2e-6, atol=2e-6
    )


def test_window_resident_backbone_matches_xla_boundaries(params):
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    assert swin._boundary_fused_plan(params, CFG, imgs, False, None) == [
        "full", "full", "full",
    ]
    sb.set_boundary_impl("xla")
    ref = np.asarray(swin.swin_apply(params, CFG, imgs))
    sb.set_boundary_impl("kernel")
    got = np.asarray(swin.swin_apply(params, CFG, imgs))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_window_resident_backbone_bf16_bit_identical(params):
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    sb.set_boundary_impl("xla")
    ref = np.asarray(
        swin.swin_apply(params, CFG, imgs, dtype=jnp.bfloat16)
    ).astype(np.float32)
    sb.set_boundary_impl("kernel")
    got = np.asarray(
        swin.swin_apply(params, CFG, imgs, dtype=jnp.bfloat16)
    ).astype(np.float32)
    np.testing.assert_array_equal(got, ref)


def test_boundary_plan_gates(params):
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    # train mode never takes the boundary path
    assert swin._boundary_fused_plan(params, CFG, imgs, True, None) is None
    # xla boundary impl disables it
    sb.set_boundary_impl("xla")
    assert swin._boundary_fused_plan(params, CFG, imgs, False, None) is None
    sb.set_boundary_impl("kernel")
    # non-fused attention impl disables it
    import dataclasses

    cfg_xla = dataclasses.replace(CFG, attention_impl="xla")
    assert swin._boundary_fused_plan(params, cfg_xla, imgs, False, None) is None
