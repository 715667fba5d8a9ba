"""Fused Pallas TPU kernels for the WITH-GRAD primary render core.

The profiled training step is HBM-bandwidth-bound: the XLA path spills every
MLP activation (65k points x 256 f32 per layer, times forward + linearized
+ double-backward streams) to HBM — ~16 GB traffic per 512-ray step.  These
kernels keep the whole per-point computation in VMEM:

* ``fused_sdf_value_feat_grad`` — frequency encoding + 8x256 softplus(100)
  MLP with dual heads AND the analytic input gradient (a manual in-kernel
  reverse sweep).  Replaces ``fields/sdf.py::sdf_value_feat_grad`` (which
  mirrors the reference's ``SDFNetwork.gradient`` double-backward setup,
  ``fields/sdf_field.py:136-148`` in iamNCJ/NRHints).
* ``fused_reflectance_forward`` — the 4x256 ReLU reflectance MLP
  (``fields/reflectance_network.py:68-84``) on pre-encoded inputs.

Both are ``jax.custom_vjp`` ops whose BACKWARD is also a Pallas kernel: it
re-reads only the raw inputs, recomputes the forward block-by-block in VMEM,
and obtains exact cotangents by calling ``jax.vjp`` over the in-kernel jnp
program (for the SDF op that program already contains the reverse sweep, so
the eikonal double-backward falls out mechanically — no hand-derived
second-order math).  Parameter gradients are accumulated across the
sequential TPU grid into VMEM-resident output blocks.

The ops are defined over MATERIALIZED dense weights; the (tiny) weight-norm
reparameterization chain runs outside in XLA and is differentiable as usual.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nrhints_tpu.fields.mlp import effective_weight
from nrhints_tpu.fields.sdf import SDFNetConfig, _layer_dims
from nrhints_tpu.kernels.common import INV_SQRT2, softplus100_gate


# ---------------------------------------------------------------------------
# Pure-jnp core programs (run in-kernel on VMEM values; also the test twins)


def _dot(x, w, cdt):
    # In f32 mode pin HIGHEST precision: Mosaic's default, like XLA's,
    # rounds f32 dot operands to bf16 on the MXU.
    prec = jax.lax.Precision.HIGHEST if cdt is None else jax.lax.Precision.DEFAULT
    if cdt is not None:
        x = x.astype(cdt)
        w = w.astype(cdt)
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )


def _dot_t(g, w, cdt):
    """g @ w.T without materializing the transpose."""
    prec = jax.lax.Precision.HIGHEST if cdt is None else jax.lax.Precision.DEFAULT
    if cdt is not None:
        g = g.astype(cdt)
        w = w.astype(cdt)
    return jax.lax.dot_general(
        g, w, (((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )


def sdf_core_ref(
    weights: Sequence[jnp.ndarray],
    x: jnp.ndarray,  # [M, 3] raw points
    cfg: SDFNetConfig,
    compute_dtype: str = "float32",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (sdf [M], feat [M, F], grad_x sdf [M, 3]).

    Weights layout: (w0, b0, ..., w{L-1}, b{L-1}, w_sdf, b_sdf, w_feat,
    b_feat), with w [in, out] and b [1, out].  The gradient comes from a
    manual reverse sweep (softplus(100.)' = sigmoid(100.)) — written in
    plain jnp so ``jax.vjp`` over this whole function yields the exact
    second-order backward the eikonal loss needs.
    """
    cdt = None if compute_dtype == "float32" else jnp.dtype(compute_dtype)
    L = cfg.n_layers
    F = cfg.multi_res
    d_in = cfg.d_in
    io, _ = _layer_dims(cfg)

    xs = x * cfg.scale
    # Frequencies as static python scalars: float iota / 2**iota fail in
    # Mosaic, and captured jnp constants are rejected by pallas_call.
    sblocks = [
        xs[:, d : d + 1] * (2.0 ** f) for d in range(d_in) for f in range(F)
    ]
    scaled = jnp.concatenate(sblocks, axis=-1)  # [M, d_in*F] dim-major
    sin_b = jnp.sin(scaled)
    cos_b = jnp.sin(scaled + jnp.pi / 2.0)
    enc = jnp.concatenate([xs, sin_b, cos_b], axis=-1)  # [M, d0]
    d0 = enc.shape[-1]

    h = enc
    gates = []  # sigmoid(100 z_i) per layer, for the reverse sweep
    for i in range(L):
        if i in cfg.skip_in:
            h = jnp.concatenate([h, enc], axis=-1) * INV_SQRT2
        z = _dot(h, weights[2 * i], cdt) + weights[2 * i + 1]
        h, gate = softplus100_gate(z)
        gates.append(gate)

    w_sdf, b_sdf = weights[2 * L], weights[2 * L + 1]
    w_feat, b_feat = weights[2 * L + 2], weights[2 * L + 3]
    sdf = (_dot(h, w_sdf, cdt) + b_sdf) / cfg.scale  # [M, 1]
    feat = _dot(h, w_feat, cdt) + b_feat

    # Reverse sweep: cotangent of sdf[:, 0] wrt each layer input.
    m = x.shape[0]
    # Row-vector broadcast via arithmetic (explicit broadcast_to can trip
    # Mosaic); w_sdf is [d_last, 1] -> cotangent row [1, d_last].
    g = (jnp.transpose(w_sdf) + jnp.zeros((m, 1), xs.dtype)) / cfg.scale
    g_enc = jnp.zeros_like(enc)
    for i in reversed(range(L)):
        g = g * gates[i]
        g = _dot_t(g, weights[2 * i], cdt)  # wrt the layer's input
        if i in cfg.skip_in:
            g = g * INV_SQRT2
            split = io[i][0] - d0
            g_enc = g_enc + g[:, split:]
            g = g[:, :split]
    g_enc = g_enc + g

    # Through the encoding: enc = [xs, sin(S), cos(S)], S dim-major.
    gx = g_enc[:, :d_in]
    g_sin = g_enc[:, d_in : d_in + d_in * F]
    g_cos = g_enc[:, d_in + d_in * F :]
    dS = g_sin * cos_b - g_cos * sin_b  # [M, d_in*F]
    per_dim = []
    for d in range(d_in):
        acc = dS[:, d * F : d * F + 1]
        for f in range(1, F):
            acc = acc + dS[:, d * F + f : d * F + f + 1] * (2.0 ** f)
        per_dim.append(acc)
    gx = gx + jnp.concatenate(per_dim, axis=-1)
    # xs = x * scale and sdf = raw / scale: the two scale factors cancel,
    # but keep both chains explicit (gx is wrt xs here).
    gx = gx * cfg.scale

    return sdf[:, 0:1], feat, gx


def mlp_relu_ref(
    weights: Sequence[jnp.ndarray],
    x: jnp.ndarray,  # [M, d0] pre-encoded input
    n_layers: int,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """ReLU MLP with a linear final layer (the reflectance trunk).
    Weights: (w0, b0, ..., w{n}, b{n}) with n_layers hidden activations."""
    cdt = None if compute_dtype == "float32" else jnp.dtype(compute_dtype)
    h = x
    for i in range(n_layers + 1):
        h = _dot(h, weights[2 * i], cdt) + weights[2 * i + 1]
        if i < n_layers:
            h = jnp.maximum(h, 0.0)
    return h


# ---------------------------------------------------------------------------
# Kernel plumbing shared by both ops


def _pad_rows(arrs, bp):
    n = arrs[0].shape[0]
    n_blocks = -(-n // bp)
    pad = n_blocks * bp - n
    if pad:
        arrs = [
            jnp.concatenate(
                [a, jnp.ones((pad, *a.shape[1:]), a.dtype)], axis=0
            )
            for a in arrs
        ]
    return arrs, n, n_blocks


def _weight_specs(weights):
    """Whole-array VMEM specs (same block every grid step -> loaded once)."""
    return [
        pl.BlockSpec(w.shape, (lambda nd: (lambda i: (0,) * nd))(w.ndim), memory_space=pltpu.VMEM)
        for w in weights
    ]


def _row_spec(bp, width):
    return pl.BlockSpec((bp, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _as_rows(arr):
    """Biases as [1, n] rows (Mosaic wants >=2-D operands)."""
    return arr[None, :] if arr.ndim == 1 else arr


# ---------------------------------------------------------------------------
# Fused SDF core (value + feature + input gradient), custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sdf_core_op(opts, weights, x):
    return _sdf_core_fwd_pallas(opts, weights, x)


def _sdf_core_fwd(opts, weights, x):
    out = _sdf_core_fwd_pallas(opts, weights, x)
    return out, (weights, x)


def _sdf_core_bwd(opts, res, cots):
    weights, x = res
    dws, dx = _sdf_core_bwd_pallas(opts, weights, x, cots)
    return dws, dx


_sdf_core_op.defvjp(_sdf_core_fwd, _sdf_core_bwd)


def _sdf_core_fwd_pallas(opts, weights, x):
    cfg, bp, _bp_bwd, interpret, compute_dtype = opts
    (x_p,), n, n_blocks = _pad_rows([x], bp)
    n_w = len(weights)
    d_feat = cfg.d_out_feat

    def kernel(x_ref, *refs):
        w_refs, out_refs = refs[:n_w], refs[n_w:]
        ws = [r[:] for r in w_refs]
        sdf, feat, gx = sdf_core_ref(ws, x_ref[:], cfg, compute_dtype)
        out_refs[0][:] = sdf
        out_refs[1][:] = feat
        out_refs[2][:] = gx

    sdf, feat, gx = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[_row_spec(bp, 3), *_weight_specs(weights)],
        out_specs=(
            _row_spec(bp, 1),
            _row_spec(bp, d_feat),
            _row_spec(bp, 3),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * bp, d_feat), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * bp, 3), jnp.float32),
        ),
        interpret=interpret,
    )(x_p, *weights)
    return sdf[:n, 0], feat[:n], gx[:n]


def _sdf_core_bwd_pallas(opts, weights, x, cots):
    cfg, _bp_fwd, bp, interpret, compute_dtype = opts
    d_sdf, d_feat_c, d_gx = cots
    d_feat_dim = cfg.d_out_feat
    (x_p, ds_p, df_p, dg_p), n, n_blocks = _pad_rows(
        [x, d_sdf.reshape(-1, 1), d_feat_c, d_gx], bp
    )
    # Zero the padded cotangent rows so they contribute nothing to dW.
    if n_blocks * bp != n:
        row = jnp.arange(n_blocks * bp)[:, None]
        keep = (row < n).astype(jnp.float32)
        ds_p, df_p, dg_p = ds_p * keep, df_p * keep, dg_p * keep

    n_w = len(weights)

    def kernel(x_ref, ds_ref, df_ref, dg_ref, *refs):
        w_refs = refs[:n_w]
        dw_refs, dx_ref = refs[n_w : 2 * n_w], refs[2 * n_w]
        ws = [r[:] for r in w_refs]

        def f(ws_tuple, xx):
            return sdf_core_ref(list(ws_tuple), xx, cfg, compute_dtype)

        _, vjp_fn = jax.vjp(f, tuple(ws), x_ref[:])
        dws, dx = vjp_fn((ds_ref[:], df_ref[:], dg_ref[:]))

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r, dw in zip(dw_refs, dws):
                r[:] = dw

        @pl.when(pl.program_id(0) > 0)
        def _():
            for r, dw in zip(dw_refs, dws):
                r[:] = r[:] + dw

        dx_ref[:] = dx

    w_specs = _weight_specs(weights)
    dw_specs = _weight_specs(weights)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            _row_spec(bp, 3),
            _row_spec(bp, 1),
            _row_spec(bp, d_feat_dim),
            _row_spec(bp, 3),
            *w_specs,
        ],
        out_specs=(*dw_specs, _row_spec(bp, 3)),
        out_shape=(
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
            jax.ShapeDtypeStruct((n_blocks * bp, 3), jnp.float32),
        ),
        interpret=interpret,
    )(x_p, ds_p, df_p, dg_p, *weights)
    dws, dx = outs[:n_w], outs[n_w]
    return tuple(dws), dx[:n]


def materialize_sdf_weights_full(params: dict, cfg: SDFNetConfig) -> tuple:
    """Weight-norm SDF params -> flat dense tuple INCLUDING the feature head:
    (w0, b0, ..., w_sdf, b_sdf, w_feat, b_feat); biases as [1, n] rows."""
    out = []
    for i in range(cfg.n_layers):
        w, b = effective_weight(params[f"lin{i}"])
        out += [w, _as_rows(b)]
    for head in ("out_sdf", "out_feat"):
        w, b = effective_weight(params[head])
        out += [w, _as_rows(b)]
    return tuple(out)


def fused_sdf_value_feat_grad(
    params: dict,
    cfg: SDFNetConfig,
    x: jnp.ndarray,
    *,
    block_pts: int = 256,
    block_pts_bwd: int = 128,
    interpret: bool = False,
    compute_dtype: str = "bfloat16",
    backward: str = "recompute",
):
    """Drop-in fused replacement for ``sdf_value_feat_grad`` (frequency
    encoding only) -> (sdf [N], feat [N, F], grad [N, 3]).  Differentiable
    wrt ``params`` and ``x`` (custom VJP).

    ``backward`` selects the VJP schedule: "recompute" (re-run the primal
    in-kernel) or "stash" (read activations stashed by the forward —
    kernels/core_stash.py; fewer backward matmul passes, one extra HBM
    round trip).

    ``compute_dtype="bfloat16"`` rounds the DOT OPERANDS only (f32
    accumulation and activations) — the same semantics XLA:TPU applies to
    f32 matmuls at its DEFAULT precision, so the fused path matches the
    XLA path's effective precision while running the MXU at full rate.
    Pass "float32" for exact-f32 dots (e.g. interpret-mode twin tests)."""
    cdt = compute_dtype
    if backward in ("stash", "stash_all", "stash_xla"):
        from nrhints_tpu.kernels.core_stash import fused_sdf_value_feat_grad_stash

        return fused_sdf_value_feat_grad_stash(
            params, cfg, x,
            block_pts=block_pts, block_pts_bwd=block_pts_bwd,
            interpret=interpret, compute_dtype=cdt,
            stash_us=(backward == "stash_all"),
            bwd_impl="xla" if backward == "stash_xla" else "pallas",
        )
    weights = materialize_sdf_weights_full(params, cfg)
    opts = (cfg, block_pts, block_pts_bwd, interpret, cdt)
    sdf, feat, gx = _sdf_core_op(opts, weights, x)
    return sdf, feat, gx


# ---------------------------------------------------------------------------
# Fused generic ReLU MLP (reflectance trunk), custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mlp_op(opts, weights, x):
    return _mlp_fwd_pallas(opts, weights, x)


def _mlp_fwd(opts, weights, x):
    return _mlp_fwd_pallas(opts, weights, x), (weights, x)


def _mlp_bwd(opts, res, g):
    weights, x = res
    return _mlp_bwd_pallas(opts, weights, x, g)


_mlp_op.defvjp(_mlp_fwd, _mlp_bwd)


def _mlp_fwd_pallas(opts, weights, x):
    n_layers, bp, _bp_bwd, interpret, compute_dtype = opts
    (x_p,), n, n_blocks = _pad_rows([x], bp)
    d0 = x.shape[-1]
    d_out = weights[-2].shape[-1]
    n_w = len(weights)

    def kernel(x_ref, *refs):
        w_refs, (out_ref,) = refs[:n_w], refs[n_w:]
        ws = [r[:] for r in w_refs]
        out_ref[:] = mlp_relu_ref(ws, x_ref[:], n_layers, compute_dtype)

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[_row_spec(bp, d0), *_weight_specs(weights)],
        out_specs=_row_spec(bp, d_out),
        out_shape=jax.ShapeDtypeStruct((n_blocks * bp, d_out), jnp.float32),
        interpret=interpret,
    )(x_p, *weights)
    return out[:n]


def _mlp_bwd_pallas(opts, weights, x, g):
    n_layers, _bp_fwd, bp, interpret, compute_dtype = opts
    (x_p, g_p), n, n_blocks = _pad_rows([x, g], bp)
    if n_blocks * bp != n:
        row = jnp.arange(n_blocks * bp)[:, None]
        g_p = g_p * (row < n).astype(jnp.float32)
    d0 = x.shape[-1]
    d_out = weights[-2].shape[-1]
    n_w = len(weights)

    def kernel(x_ref, g_ref, *refs):
        w_refs = refs[:n_w]
        dw_refs, dx_ref = refs[n_w : 2 * n_w], refs[2 * n_w]
        ws = [r[:] for r in w_refs]

        def f(ws_tuple, xx):
            return mlp_relu_ref(list(ws_tuple), xx, n_layers, compute_dtype)

        _, vjp_fn = jax.vjp(f, tuple(ws), x_ref[:])
        dws, dx = vjp_fn(g_ref[:])

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r, dw in zip(dw_refs, dws):
                r[:] = dw

        @pl.when(pl.program_id(0) > 0)
        def _():
            for r, dw in zip(dw_refs, dws):
                r[:] = r[:] + dw

        dx_ref[:] = dx

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[_row_spec(bp, d0), _row_spec(bp, d_out), *_weight_specs(weights)],
        out_specs=(*_weight_specs(weights), _row_spec(bp, d0)),
        out_shape=(
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
            jax.ShapeDtypeStruct((n_blocks * bp, d0), jnp.float32),
        ),
        interpret=interpret,
    )(x_p, g_p, *weights)
    return tuple(outs[:n_w]), outs[n_w][:n]


def materialize_mlp_weights(params: dict, n_layers: int) -> tuple:
    """Reflectance weight-norm params -> flat dense tuple (biases as rows)."""
    out = []
    for i in range(n_layers + 1):
        w, b = effective_weight(params[f"lin{i}"])
        out += [w, _as_rows(b)]
    return tuple(out)


def fused_mlp_apply(
    params: dict,
    n_layers: int,
    x: jnp.ndarray,
    *,
    block_pts: int = 512,
    block_pts_bwd: int = 256,
    interpret: bool = False,
    compute_dtype: str = "bfloat16",
    backward: str = "recompute",
) -> jnp.ndarray:
    """Fused weight-norm ReLU MLP with linear final layer on pre-encoded
    inputs -> [N, d_out] raw logits (apply the squeeze outside).
    ("stash_all" is meaningful only for the SDF op's second-order sweep;
    here it maps to the plain stash backward.)"""
    if backward in ("stash", "stash_all", "stash_xla"):
        from nrhints_tpu.kernels.core_stash import fused_mlp_apply_stash

        return fused_mlp_apply_stash(
            params, n_layers, x,
            block_pts=block_pts, block_pts_bwd=block_pts_bwd,
            interpret=interpret, compute_dtype=compute_dtype,
            bwd_impl="xla" if backward == "stash_xla" else "pallas",
        )
    weights = materialize_mlp_weights(params, n_layers)
    opts = (n_layers, block_pts, block_pts_bwd, interpret, compute_dtype)
    return _mlp_op(opts, weights, x)


def fused_reflectance_forward(
    params: dict,
    cfg,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feature_vectors: jnp.ndarray,
    point_lights: jnp.ndarray,
    visibilities: jnp.ndarray | None = None,
    specular_cue: jnp.ndarray | None = None,
    *,
    block_pts: int = 512,
    block_pts_bwd: int | None = None,
    interpret: bool = False,
    compute_dtype: str = "bfloat16",
    backward: str = "recompute",
) -> jnp.ndarray:
    """Drop-in fused replacement for ``reflectance_forward``: the (cheap)
    frequency encodings + concat run in XLA and fuse with the upstream
    graph; the 4x256 trunk runs as the Pallas custom-VJP op.

    ``block_pts_bwd=None`` resolves per backward schedule: 1024 for "stash"
    (no recompute working set; same-session sweep 2.65 vs 2.71 ms at 512,
    3.15 vs 3.58 at 256 across sessions; 768 regresses — non-power-of-2 —
    and 2048 fails Mosaic compile), 256 for "recompute" (3.51 vs 3.61 ms
    at 512).  PROFILE.md "Core backward schedule"."""
    if block_pts_bwd is None:
        block_pts_bwd = 1024 if backward in ("stash", "stash_all", "stash_xla") else 256
    from nrhints_tpu.core.encodings import nerf_encoding

    view_enc = nerf_encoding(view_dirs, cfg.multi_res, include_input=True)
    pl_enc = nerf_encoding(point_lights, cfg.multi_res, include_input=True)
    parts = [points, view_enc, normals, pl_enc, feature_vectors]
    if visibilities is not None:
        parts.append(nerf_encoding(visibilities, cfg.multi_res, include_input=True))
    if specular_cue is not None:
        parts.append(nerf_encoding(specular_cue, cfg.multi_res, include_input=True))
    h = jnp.concatenate(parts, axis=-1)
    out = fused_mlp_apply(
        params,
        cfg.n_layers,
        h,
        block_pts=block_pts,
        block_pts_bwd=block_pts_bwd,
        interpret=interpret,
        compute_dtype=compute_dtype,
        backward=backward,
    )
    if cfg.squeeze_out:
        out = jax.nn.sigmoid(out)
    return out
