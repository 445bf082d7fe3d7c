"""Fused-training Swin block: value + gradient parity vs the XLA path.

The custom VJP (ops/swin_block_fused.swin_block_fused_train) recomputes block
internals in two fused backward kernels; these tests pin it against
jax.grad through the reference-exact XLA path on eligible tiny configs —
plain and shifted blocks, with and without stochastic depth (same rng keys on
both paths, so the drawn drop-path masks coincide).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from on_device_image_captioning_tpu.config import SwinConfig
from on_device_image_captioning_tpu.models import swin

TINY = SwinConfig(
    img_size=32, patch_size=4, embed_dim=16, depths=(2, 2), num_heads=(2, 4),
    window_size=4,
)
FUSED = dataclasses.replace(TINY, attention_impl="fused")


def _block_inputs(stage=0, seed=0):
    rng = np.random.default_rng(seed)
    params = swin.swin_init(jax.random.PRNGKey(seed), TINY)
    p = params["stages"][stage]["blocks"][0]
    res = TINY.stage_resolution(stage)[0]
    c = TINY.embed_dim * (2**stage)
    x = jnp.asarray(
        rng.standard_normal((2, res * res, c), dtype=np.float32)
    )
    return p, x


@pytest.mark.parametrize("stage,block,rate", [
    (0, 0, 0.0),   # plain window block, no stochastic depth
    (0, 1, 0.0),   # shifted block (wrap-around mask)
    (0, 0, 0.3),   # stochastic depth active (per-image masks)
    (1, 1, 0.1),   # second stage, shifted + drop-path
])
def test_fused_train_block_matches_xla_grads(stage, block, rate):
    p, x = _block_inputs(stage)
    key = jax.random.PRNGKey(7)

    def loss(cfg):
        def f(p_, x_):
            y = swin.swin_block(
                p_, cfg, x_, stage, block, key, True, rate, None
            )
            return jnp.sum(y * y)

        return f

    val_x, (gp_x, gx_x) = jax.value_and_grad(loss(TINY), argnums=(0, 1))(p, x)
    val_f, (gp_f, gx_f) = jax.value_and_grad(loss(FUSED), argnums=(0, 1))(p, x)

    np.testing.assert_allclose(val_f, val_x, rtol=2e-5)
    np.testing.assert_allclose(gx_f, gx_x, rtol=2e-4, atol=2e-5)
    flat_x, _ = jax.tree.flatten(gp_x)
    flat_f, tree_f = jax.tree.flatten(gp_f)
    paths = jax.tree_util.tree_leaves_with_path(gp_x)
    for (path, a), b in zip(paths, flat_f):
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=2e-5, err_msg=str(path)
        )


def test_fused_train_full_backbone_step():
    """End-to-end: grads of a tiny backbone agree between impls, including the
    patch-embed params below and the final LN above the fused blocks."""
    params = swin.swin_init(jax.random.PRNGKey(0), TINY)
    imgs = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 32, 3), dtype=np.float32)
    )
    key = jax.random.PRNGKey(3)

    def loss(cfg):
        def f(p):
            y = swin.swin_apply(p, cfg, imgs, train=True, rng=key)
            return jnp.mean(y * y)

        return f

    val_x, g_x = jax.value_and_grad(loss(TINY))(params)
    val_f, g_f = jax.value_and_grad(loss(FUSED))(params)
    np.testing.assert_allclose(val_f, val_x, rtol=2e-5)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_x), jax.tree.leaves(g_f)
    ):
        np.testing.assert_allclose(
            b, a, rtol=3e-4, atol=3e-5, err_msg=str(path)
        )


def test_fused_train_quantized_falls_back():
    """Quantized (non-dense) blocks must silently take the XLA path."""
    from on_device_image_captioning_tpu.deploy.quantization import quantize_tree

    p, x = _block_inputs(0)
    pq = quantize_tree(p, "w8")
    key = jax.random.PRNGKey(0)
    y = swin.swin_block(pq, FUSED, x, 0, 0, key, True, 0.0, None)
    assert y.shape == x.shape


def test_fused_train_remat_gating_preserves_grads():
    """--remat skips jax.checkpoint for fused-train blocks (their custom VJP
    already recomputes in the backward); gradients must match the un-remat
    fused run exactly."""
    params = swin.swin_init(jax.random.PRNGKey(0), TINY)
    imgs = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 32, 32, 3), dtype=np.float32)
    )
    key = jax.random.PRNGKey(5)

    def loss(remat):
        def f(p):
            y = swin.swin_apply(p, FUSED, imgs, train=True, rng=key, remat=remat)
            return jnp.mean(y * y)

        return f

    val_a, g_a = jax.value_and_grad(loss(False))(params)
    val_b, g_b = jax.value_and_grad(loss(True))(params)
    np.testing.assert_allclose(val_b, val_a, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("stage,block,rate", [
    (0, 0, 0.0),
    (0, 1, 0.0),   # shifted block
    (1, 0, 0.3),   # stochastic depth active
])
def test_fused_train_halves_matches_xla_grads(stage, block, rate, monkeypatch):
    """Stages whose full weight set exceeds VMEM train through the standalone
    attention-half + MLP-half VJPs (Swin-L stage 2). Tiny dims are always
    'full'-eligible, so force the halves path by failing the full check."""
    from on_device_image_captioning_tpu.ops import swin_block_fused as sbf

    monkeypatch.setattr(sbf, "eligible", lambda *a, **k: False)
    assert swin._fused_train_mode(
        FUSED, _block_inputs(stage)[0], 16 * 2**stage, True, jnp.float32
    ) == "halves"

    p, x = _block_inputs(stage)
    key = jax.random.PRNGKey(11)

    def loss(cfg):
        def f(p_, x_):
            y = swin.swin_block(
                p_, cfg, x_, stage, block, key, True, rate, None
            )
            return jnp.sum(y * y)

        return f

    val_x, (gp_x, gx_x) = jax.value_and_grad(loss(TINY), argnums=(0, 1))(p, x)
    val_f, (gp_f, gx_f) = jax.value_and_grad(loss(FUSED), argnums=(0, 1))(p, x)

    np.testing.assert_allclose(val_f, val_x, rtol=2e-5)
    np.testing.assert_allclose(gx_f, gx_x, rtol=2e-4, atol=2e-5)
    flat_f, _ = jax.tree.flatten(gp_f)
    paths = jax.tree_util.tree_leaves_with_path(gp_x)
    for (path, a), b in zip(paths, flat_f):
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=2e-5, err_msg=str(path)
        )


def test_fused_train_block_bf16_grads_close():
    """bf16 training mode: the fused VJP's compute-dtype backward dots track
    the XLA path's bf16 backward within bf16-roundoff tolerances (exact
    parity is an f32-mode property — see the cases above)."""
    p, x = _block_inputs(0)
    key = jax.random.PRNGKey(5)

    def loss(cfg):
        def f(p_, x_):
            y = swin.swin_block(
                p_, cfg, x_, 0, 1, key, True, 0.0, jnp.bfloat16
            )
            return jnp.sum(y.astype(jnp.float32) ** 2)

        return f

    xb = x.astype(jnp.bfloat16)
    val_x, (gp_x, gx_x) = jax.value_and_grad(loss(TINY), argnums=(0, 1))(p, xb)
    val_f, (gp_f, gx_f) = jax.value_and_grad(loss(FUSED), argnums=(0, 1))(p, xb)
    np.testing.assert_allclose(val_f, val_x, rtol=2e-2)
    np.testing.assert_allclose(
        gx_f.astype(np.float32), gx_x.astype(np.float32), rtol=0.15, atol=0.05
    )
    flat_f, _ = jax.tree.flatten(gp_f)
    paths = jax.tree_util.tree_leaves_with_path(gp_x)
    for (path, a), b in zip(paths, flat_f):
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            rtol=0.15, atol=0.05, err_msg=str(path),
        )
