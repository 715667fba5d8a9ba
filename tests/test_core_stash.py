"""Stash-backward core ops vs the recompute ops and jax ground truth.

The stash variants (kernels/core_stash.py) must produce IDENTICAL forward
outputs to the recompute ops (same op order in-kernel) and, in f32-stash
f32-compute interpret mode, gradients matching ``jax.vjp`` of the shared
jnp twin to float tolerance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
from nrhints_tpu.kernels.core_mlp import (
    fused_mlp_apply,
    fused_sdf_value_feat_grad,
    materialize_mlp_weights,
    materialize_sdf_weights_full,
    mlp_relu_ref,
    sdf_core_ref,
)
from nrhints_tpu.kernels.core_stash import (
    fused_mlp_apply_stash,
    fused_sdf_value_feat_grad_stash,
    mlp_relu_bwd_stash_ref,
    mlp_relu_fwd_zs_ref,
    sdf_core_bwd_stash_ref,
    sdf_core_fwd_hs_ref,
)


def _assert_close_scaled(a, b, tol=1e-4):
    """max|a-b| <= tol * max|b|: scale-normalized closeness (dW entries that
    nearly cancel across the batch carry f32 reassociation noise)."""
    a, b = np.asarray(a), np.asarray(b)
    scale = max(float(np.max(np.abs(b))), 1e-6)
    err = float(np.max(np.abs(a - b)))
    assert err <= tol * scale, f"err {err:.3e} vs scale {scale:.3e}"


@pytest.fixture(scope="module")
def sdf_setup():
    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 0.4, (96, 3)).astype(np.float32))
    return cfg, params, x


def test_fwd_hs_matches_core_ref(sdf_setup):
    cfg, params, x = sdf_setup
    ws = materialize_sdf_weights_full(params, cfg)
    sdf_a, feat_a, gx_a = sdf_core_ref(list(ws), x, cfg, "float32")
    sdf_b, feat_b, gx_b, hs = sdf_core_fwd_hs_ref(list(ws), x, cfg, "float32")
    np.testing.assert_array_equal(np.asarray(sdf_a), np.asarray(sdf_b))
    np.testing.assert_array_equal(np.asarray(feat_a), np.asarray(feat_b))
    np.testing.assert_array_equal(np.asarray(gx_a), np.asarray(gx_b))
    assert len(hs) == cfg.n_layers


def test_bwd_stash_ref_matches_vjp(sdf_setup):
    cfg, params, x = sdf_setup
    ws = materialize_sdf_weights_full(params, cfg)
    rng = np.random.default_rng(5)

    def f(wl, xx):
        return sdf_core_ref(wl, xx, cfg, "float32")

    primal, vjp_fn = jax.vjp(f, list(ws), x)
    cots = tuple(
        jnp.asarray(rng.normal(0, 1, p.shape).astype(np.float32)) for p in primal
    )
    dws_gt, dx_gt = vjp_fn(cots)

    _, _, _, hs = sdf_core_fwd_hs_ref(list(ws), x, cfg, "float32")
    dws, dx = sdf_core_bwd_stash_ref(list(ws), x, hs, cots, cfg, "float32")

    # The two schedules sum identical per-row contributions in different
    # orders, so near-cancelling dW entries carry f32 reassociation noise;
    # compare against each tensor's magnitude, not elementwise rtol.
    _assert_close_scaled(dx, dx_gt)
    for a, b in zip(dws, dws_gt):
        _assert_close_scaled(a, b)


def test_stash_op_interpret_matches_recompute_op(sdf_setup):
    cfg, params, x = sdf_setup
    kw = dict(block_pts=32, block_pts_bwd=32, interpret=True, compute_dtype="float32")

    def loss_a(p):
        sdf, feat, gx = fused_sdf_value_feat_grad(p, cfg, x, **kw)
        return jnp.sum(sdf * 1.3 + jnp.sum(feat) * 1e-3 + jnp.sum(gx ** 2))

    def loss_b(p):
        sdf, feat, gx = fused_sdf_value_feat_grad_stash(
            p, cfg, x, stash_dtype="float32", **kw
        )
        return jnp.sum(sdf * 1.3 + jnp.sum(feat) * 1e-3 + jnp.sum(gx ** 2))

    va, ga = jax.value_and_grad(loss_a)(params)
    vb, gb = jax.value_and_grad(loss_b)(params)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for a, b in zip(flat_a, flat_b):
        _assert_close_scaled(a, b)


def test_stash_op_padding(sdf_setup):
    """Non-divisible row counts: padded rows must not pollute dW."""
    cfg, params, x = sdf_setup
    x_odd = x[:77]
    kw = dict(block_pts=32, block_pts_bwd=32, interpret=True, compute_dtype="float32")

    def loss(p):
        sdf, feat, gx = fused_sdf_value_feat_grad_stash(
            p, cfg, x_odd, stash_dtype="float32", **kw
        )
        return jnp.sum(sdf) + jnp.sum(gx)

    def loss_ref(p):
        ws = materialize_sdf_weights_full(p, cfg)
        sdf, feat, gx = sdf_core_ref(list(ws), x_odd, cfg, "float32")
        return jnp.sum(sdf) + jnp.sum(gx)

    g = jax.grad(loss)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_ref)):
        _assert_close_scaled(a, b)


# ---------------------------------------------------------------------------
# ReLU MLP stash variant


@pytest.fixture(scope="module")
def mlp_setup():
    from nrhints_tpu.fields.mlp import torch_default_linear_init, weight_norm_params

    n_layers = 4
    key = jax.random.PRNGKey(7)
    dims = [100, 64, 64, 64, 64, 3]
    params = {}
    for i in range(n_layers + 1):
        key, k = jax.random.split(key)
        w, b = torch_default_linear_init(k, dims[i], dims[i + 1])
        params[f"lin{i}"] = weight_norm_params(w, b)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1, (80, 100)).astype(np.float32))
    return n_layers, params, x


def test_mlp_stash_refs(mlp_setup):
    n_layers, params, x = mlp_setup
    ws = materialize_mlp_weights(params, n_layers)
    out_a = mlp_relu_ref(list(ws), x, n_layers, "float32")
    out_b, zs = mlp_relu_fwd_zs_ref(list(ws), x, n_layers, "float32")
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

    rng = np.random.default_rng(13)
    g = jnp.asarray(rng.normal(0, 1, out_a.shape).astype(np.float32))

    def f(wl, xx):
        return mlp_relu_ref(wl, xx, n_layers, "float32")

    _, vjp_fn = jax.vjp(f, list(ws), x)
    dws_gt, dx_gt = vjp_fn(g)
    dws, dx = mlp_relu_bwd_stash_ref(list(ws), x, zs, g, n_layers, "float32")
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_gt), rtol=1e-5, atol=1e-6)
    for a, b in zip(dws, dws_gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_mlp_stash_op_interpret(mlp_setup):
    n_layers, params, x = mlp_setup
    kw = dict(block_pts=32, block_pts_bwd=32, interpret=True, compute_dtype="float32")
    rng = np.random.default_rng(17)
    t = jnp.asarray(rng.normal(0, 1, (80, 3)).astype(np.float32))

    def loss_a(p):
        return jnp.sum((fused_mlp_apply(p, n_layers, x, **kw) - t) ** 2)

    def loss_b(p):
        return jnp.sum(
            (fused_mlp_apply_stash(p, n_layers, x, stash_dtype="float32", **kw) - t)
            ** 2
        )

    va, ga = jax.value_and_grad(loss_a)(params)
    vb, gb = jax.value_and_grad(loss_b)(params)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # round-5 fast-tier triage (43 s; stash-vs-recompute
# gradient equivalence stays fast in the kernel-level tests)
def test_renderer_stash_and_rank_merge_match_defaults():
    """Full fused render (interpret) with core_backward='stash' and
    march_merge='rank' reproduces the default path's outputs and gradients
    — the knobs are pure execution-schedule changes."""
    import dataclasses

    from tests.test_shard_fused import flagship_tiny_config, make_rays

    from nrhints_tpu.render.renderer import init_model_params, render_rays

    # march_dtype pinned f32 on BOTH sides: this test compares the stash /
    # rank-merge knobs, and the round-5 bf16 sweep default makes exact
    # z-ties more common — tied z with different sdf payloads is the one
    # place rank and bitonic merges may legitimately order differently.
    cfg = flagship_tiny_config()
    cfg = dataclasses.replace(
        cfg, renderer=dataclasses.replace(cfg.renderer, march_dtype="float32")
    )
    cfg_v2 = dataclasses.replace(
        cfg,
        renderer=dataclasses.replace(
            cfg.renderer, core_backward="stash", march_merge="rank",
            core_block_pts_bwd=32,
        ),
    )
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    rays = make_rays(8, seed=3)

    def loss(p, c):
        out = render_rays(p, c, rays, None, cos_anneal_ratio=1.0)
        return jnp.sum(out.rgb) + jnp.sum(out.analytic_normals ** 2)

    v1, g1 = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(p, cfg_v2))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    # Both paths round dot operands to bf16, and the stash path reads bf16
    # activations where the recompute path rebuilds f32 ones — measured
    # ~1.2e-3-of-scale worst-case gradient difference on small leaves (same
    # order as the bf16-operand noise both paths already carry vs pure f32;
    # the f32-stash op-level tests above pin the schedule itself exactly).
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        _assert_close_scaled(a, b, tol=3e-3)


def test_bwd_stash_all_ref_matches_vjp(sdf_setup):
    """The 4L stash_all backward (hand RevSweep vjp at stashed us) vs
    jax.vjp of the shared twin."""
    from nrhints_tpu.kernels.core_stash import sdf_core_bwd_stash_all_ref

    cfg, params, x = sdf_setup
    ws = materialize_sdf_weights_full(params, cfg)
    rng = np.random.default_rng(23)

    def f(wl, xx):
        return sdf_core_ref(wl, xx, cfg, "float32")

    primal, vjp_fn = jax.vjp(f, list(ws), x)
    cots = tuple(
        jnp.asarray(rng.normal(0, 1, p.shape).astype(np.float32)) for p in primal
    )
    dws_gt, dx_gt = vjp_fn(cots)

    _, _, _, hs, us, g_enc = sdf_core_fwd_hs_ref(
        list(ws), x, cfg, "float32", return_us=True
    )
    dws, dx = sdf_core_bwd_stash_all_ref(
        list(ws), x, hs, us, g_enc, cots, cfg, "float32"
    )
    _assert_close_scaled(dx, dx_gt)
    for a, b in zip(dws, dws_gt):
        _assert_close_scaled(a, b)


def test_stash_all_op_interpret_matches_recompute(sdf_setup):
    cfg, params, x = sdf_setup
    kw = dict(block_pts=32, block_pts_bwd=32, interpret=True, compute_dtype="float32")

    def loss_a(p):
        sdf, feat, gx = fused_sdf_value_feat_grad(p, cfg, x, **kw)
        return jnp.sum(sdf * 1.3 + jnp.sum(feat) * 1e-3 + jnp.sum(gx ** 2))

    def loss_b(p):
        sdf, feat, gx = fused_sdf_value_feat_grad_stash(
            p, cfg, x, stash_dtype="float32", stash_us=True, **kw
        )
        return jnp.sum(sdf * 1.3 + jnp.sum(feat) * 1e-3 + jnp.sum(gx ** 2))

    va, ga = jax.value_and_grad(loss_a)(params)
    vb, gb = jax.value_and_grad(loss_b)(params)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        _assert_close_scaled(a, b)


def test_undiff_primal_uses_nonstash_forward(sdf_setup):
    """Undifferentiated stash-op calls (eval/inference) dispatch the
    NON-stash forward kernel — same outputs, no discarded stash write
    (ADVICE r4: XLA cannot DCE unused outputs of an opaque pallas_call)."""
    cfg, params, x = sdf_setup
    a = fused_sdf_value_feat_grad(
        params, cfg, x, interpret=True, compute_dtype="float32",
        backward="recompute",
    )
    b = fused_sdf_value_feat_grad_stash(
        params, cfg, x, interpret=True, compute_dtype="float32",
        stash_dtype="float32",
    )
    for ai, bi in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(bi))
    # The stash kernel still runs (and stashes) on the fwd-for-grad path.
    g = jax.grad(
        lambda p: jnp.sum(
            fused_sdf_value_feat_grad_stash(
                p, cfg, x, interpret=True, compute_dtype="float32",
                stash_dtype="float32",
            )[0]
        )
    )(params)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda l: bool(jnp.all(jnp.isfinite(l))), g)
    )


def test_stash_xla_backward_matches_pallas(sdf_setup):
    """core_backward="stash_xla" (full-batch XLA backward — the identical
    jnp program) must produce the Pallas stash backward's gradients.
    Measured SLOWER on the chip (PROFILE.md round-5 phase K: XLA spills
    the backward's concurrent cotangent streams); kept as the
    counterfactual option."""
    cfg, params, x = sdf_setup

    def loss(p, backward):
        s, f, g = fused_sdf_value_feat_grad(
            p, cfg, x, interpret=True, compute_dtype="float32",
            backward=backward,
        )
        return jnp.sum(s) + jnp.sum(f) * 1e-3 + jnp.sum(g * g)

    g_pal = jax.grad(lambda p: loss(p, "stash"))(params)
    g_xla = jax.grad(lambda p: loss(p, "stash_xla"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_xla), jax.tree_util.tree_leaves(g_pal)):
        _assert_close_scaled(a, b, tol=1e-5)
