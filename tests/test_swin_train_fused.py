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


def test_attn_bwd_emit_matches_accumulate():
    """The emit-variant attention backward (weight grads as XLA GEMMs over
    kernel-emitted rows — used at stage-2 size where the f32 dW accumulators
    overflow scoped VMEM) must match the in-kernel-accumulation variant."""
    from on_device_image_captioning_tpu.models.swin import (
        relative_position_index, shift_attn_mask,
    )
    from on_device_image_captioning_tpu.ops import swin_block_fused as sbf

    rng = np.random.default_rng(3)
    window, heads, c = 4, 4, 32
    n = window * window
    num_windows = 4  # 8x8 grid of 4x4 windows per image
    bw = 2 * num_windows
    wpb = 2
    p, _ = _block_inputs(0)
    pa = {
        "norm1": p["norm1"],
        "attn": {"qkv": p["attn"]["qkv"], "proj": p["attn"]["proj"]},
    }
    # tiny stage-0 params are c=16/heads=2; rebuild a c=32 block instead
    init = swin.swin_init(
        jax.random.PRNGKey(1),
        dataclasses.replace(TINY, embed_dim=32, num_heads=(4, 8)),
    )
    p32 = init["stages"][0]["blocks"][0]
    pa = {
        "norm1": p32["norm1"],
        "attn": {"qkv": p32["attn"]["qkv"], "proj": p32["attn"]["proj"]},
    }
    idx = jnp.asarray(relative_position_index(window).reshape(-1))
    bias = jnp.take(p32["attn"]["rel_bias"], idx, axis=0).reshape(n, n, heads)
    bias = bias.transpose(2, 0, 1).astype(jnp.float32)
    mask = jnp.asarray(
        shift_attn_mask(8, window, window // 2), jnp.float32
    )
    x = jnp.asarray(rng.standard_normal((bw, n, c)), jnp.float32)
    dx2 = jnp.asarray(rng.standard_normal((bw, n, c)), jnp.float32)
    m1s = jnp.asarray(
        rng.choice([0.0, 1.25], size=(bw // wpb, 1)), jnp.float32
    )
    common = (x, dx2, pa, bias, None, m1s, heads, num_windows, 1.0 / 8, 1e-5,
              wpb)
    base = sbf._attn_bwd_call(*common)
    emit = sbf._attn_bwd_call_emit(*common)
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dg1", "dbe1",
             "dbias"]
    for nm, a, b in zip(names, base, emit):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4, err_msg=nm
        )
    # shifted-mask variant too
    common = (x, dx2, pa, bias, mask, m1s, heads, num_windows, 1.0 / 8, 1e-5,
              wpb)
    base = sbf._attn_bwd_call(*common)
    emit = sbf._attn_bwd_call_emit(*common)
    for nm, a, b in zip(names, base, emit):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4, err_msg=nm
        )
    # force the head-sliced path (2 slices of 2 heads): the production
    # stage-2 shape (heads=24, c=768) picks G=2 from the VMEM estimate, but
    # at this tiny size the estimate lands on G=1 — slice explicitly so the
    # weight-slab split, per-slice dbias accumulation, and slice
    # concatenation are all exercised on CPU
    sliced = sbf._attn_bwd_call_emit(*common, force_groups=2)
    for nm, a, b in zip(names, base, sliced):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4, err_msg=nm
        )


def test_mlp_bwd_emit_matches_accumulate():
    """Emit-variant MLP-half backward == in-kernel-accumulation variant."""
    from on_device_image_captioning_tpu.ops import swin_block_fused as sbf

    rng = np.random.default_rng(5)
    c, hidden, rpp, blocks = 32, 128, 16, 6
    rows = rpp * blocks
    init = swin.swin_init(
        jax.random.PRNGKey(1),
        dataclasses.replace(TINY, embed_dim=32, num_heads=(4, 8)),
    )
    p32 = init["stages"][0]["blocks"][0]
    p = {"norm2": p32["norm2"], "mlp": p32["mlp"]}
    x2 = jnp.asarray(rng.standard_normal((rows, c)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((rows, c)), jnp.float32)
    m2 = jnp.asarray(rng.choice([0.0, 1.25], size=(blocks, 1)), jnp.float32)
    base = sbf._mlp_bwd_call(x2, dy, p, m2, 1e-5, rpp)
    emit = sbf._mlp_bwd_call_emit(x2, dy, p, m2, 1e-5, rpp)
    names = ["dx2", "dw1", "db1", "dw2", "db2", "dg2", "dbe2"]
    for nm, a, b in zip(names, base, emit):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4, err_msg=nm
        )


def test_fused_train_deep_stage_scan_matches_xla():
    """depth >= 4 stages train through the window-resident scan branch of
    _run_stage_fused_windows_train (pair scan + permutation transitions with
    gather-only VJPs); values and grads must match the XLA path under the
    same rng (drop-path active, pinning the stacked-key draw order)."""
    cfg = dataclasses.replace(TINY, depths=(2, 4), drop_path_rate=0.2)
    cfgf = dataclasses.replace(cfg, attention_impl="fused")
    params = swin.swin_init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 32, 32, 3), dtype=np.float32)
    )
    key = jax.random.PRNGKey(9)

    def loss(c):
        def f(p):
            y = swin.swin_apply(p, c, imgs, train=True, rng=key)
            return jnp.mean(y * y)

        return f

    val_x, g_x = jax.value_and_grad(loss(cfg))(params)
    val_f, g_f = jax.value_and_grad(loss(cfgf))(params)
    np.testing.assert_allclose(val_f, val_x, rtol=2e-5)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_x), jax.tree.leaves(g_f)
    ):
        np.testing.assert_allclose(
            b, a, rtol=3e-4, atol=3e-5, err_msg=str(path)
        )


def test_fused_train_deep_stage_lowers_under_outer_jit():
    """The window-resident scan branch must lower inside an OUTER jit — the
    real XE step is jitted. Regression: _rel_bias_gather used to lru_cache a
    per-window custom_vjp closure; built while a jit trace was live, the
    cache pinned that trace's tracers and every later jit of the scan branch
    died in lowering with 'No constant handler for DynamicJaxprTracer'."""
    cfg = dataclasses.replace(FUSED, depths=(2, 4), drop_path_rate=0.2)
    params = swin.swin_init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(8).standard_normal(
            (2, 32, 32, 3), dtype=np.float32
        )
    )
    key = jax.random.PRNGKey(2)

    def f(p):
        y = swin.swin_apply(p, cfg, imgs, train=True, rng=key)
        return jnp.mean(y * y)

    val_j, grads_j = jax.jit(jax.value_and_grad(f))(params)
    val_e, _ = jax.value_and_grad(f)(params)
    np.testing.assert_allclose(
        np.asarray(val_j), np.asarray(val_e), rtol=1e-6
    )
    assert all(np.all(np.isfinite(g)) for g in jax.tree.leaves(grads_j))


def test_fused_train_kernel_transitions_bitwise():
    """Train-transition impl 'kernel' (standalone Pallas permute kernel with
    inverse-kernel VJP) must reproduce the 'gather' impl BITWISE — both are
    pure permutations of the same rows; values and grads."""
    cfg = dataclasses.replace(FUSED, depths=(2, 4), drop_path_rate=0.2)
    params = swin.swin_init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(11).standard_normal(
            (2, 32, 32, 3), dtype=np.float32
        )
    )
    key = jax.random.PRNGKey(5)

    def f(p):
        y = swin.swin_apply(p, cfg, imgs, train=True, rng=key)
        return jnp.mean(y * y)

    prev = swin.get_train_transition_impl()
    try:
        swin.set_train_transition_impl("gather")
        val_g, g_g = jax.value_and_grad(f)(params)
        swin.set_train_transition_impl("kernel")
        val_k, g_k = jax.value_and_grad(f)(params)
    finally:
        swin.set_train_transition_impl(prev)
    np.testing.assert_array_equal(np.asarray(val_k), np.asarray(val_g))
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_g), jax.tree.leaves(g_k)
    ):
        np.testing.assert_array_equal(
            np.asarray(b), np.asarray(a), err_msg=str(path)
        )


def test_fused_train_window_resident_equals_per_block(monkeypatch):
    """The window-resident train runner must reproduce the per-block fused
    path BITWISE (shift transitions and their VJPs are pure data movement;
    kernels and rng draws are shared), values and grads both."""
    cfg = dataclasses.replace(FUSED, depths=(2, 4), drop_path_rate=0.2)
    params = swin.swin_init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 32, 32, 3), dtype=np.float32)
    )
    key = jax.random.PRNGKey(4)

    def f(p):
        y = swin.swin_apply(p, cfg, imgs, train=True, rng=key)
        return jnp.mean(y * y)

    val_w, g_w = jax.value_and_grad(f)(params)
    monkeypatch.setattr(swin, "_stage_fused_train_mode", lambda *a, **k: None)
    val_b, g_b = jax.value_and_grad(f)(params)
    np.testing.assert_array_equal(np.asarray(val_w), np.asarray(val_b))
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_b), jax.tree.leaves(g_w)
    ):
        np.testing.assert_array_equal(
            np.asarray(b), np.asarray(a), err_msg=str(path)
        )


def test_fused_train_rejects_strip_granular_scales():
    """The drop-path contract is enforced by the API: the train kernels take
    per-IMAGE (B,) stochastic-depth scales and expand to their own strip
    sizes internally; the former per-forward-strip arrays (which the
    backward could only re-tile correctly under an unchecked
    constant-per-image assumption) now raise instead of silently producing
    wrong gradients."""
    from on_device_image_captioning_tpu.ops import swin_block_fused as sbf

    p, x = _block_inputs(0)
    res = TINY.stage_resolution(0)[0]
    w = TINY.window_size
    n = w * w
    num_windows = (res // w) ** 2
    b = 2
    xw = x.reshape(b, res, res, -1)
    xw = swin._window_partition(xw, w)
    heads = TINY.num_heads[0]
    bias = jnp.zeros((heads, n, n), jnp.float32)
    pd = {
        "norm1": p["norm1"],
        "attn": {"qkv": p["attn"]["qkv"], "proj": p["attn"]["proj"]},
        "norm2": p["norm2"],
        "mlp": p["mlp"],
    }
    ok = jnp.ones((b,), jnp.float32)
    y = sbf.swin_block_fused_train(
        xw, pd, bias, None, ok, ok, heads, num_windows, 0.25, 1e-5
    )
    assert y.shape == xw.shape

    strips = xw.shape[0] // sbf.train_fwd_wpb(num_windows, n, xw.shape[-1],
                                              xw.shape[0])
    per_strip = jnp.ones((strips, 1), jnp.float32)
    if strips == b:  # make sure the shapes genuinely differ
        per_strip = jnp.ones((strips * 2, 1), jnp.float32)
    with pytest.raises(ValueError, match="per-image"):
        sbf.swin_block_fused_train(
            xw, pd, bias, None, per_strip, per_strip, heads, num_windows,
            0.25, 1e-5,
        )
    p_attn = {"norm1": p["norm1"],
              "attn": {"qkv": p["attn"]["qkv"], "proj": p["attn"]["proj"]}}
    with pytest.raises(ValueError, match="per-image"):
        sbf.swin_attn_half_fused_train(
            xw, p_attn, bias, None, per_strip, heads, num_windows, 0.25, 1e-5
        )
