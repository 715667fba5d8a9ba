"""Activation-stashing variants of the fused core custom-VJP ops.

The default backward in ``core_mlp.py`` re-runs the whole in-kernel primal
(forward L matmuls + reverse sweep L matmuls) and VJPs it — ~6L matmul
passes.  These variants stash the per-layer post-activations ``h_i`` to HBM
(bf16 by default) in the forward kernel and hand-assemble the backward as

    f(ws, x) = Tail(g_enc, x)   with   hs    = Fwd(ws, x)
                                       g_enc = RevSweep(ws, hs)
                                       sdf, feat = Heads(ws, h_L)

    vjp(Tail)      : elementwise (jax.vjp in-kernel)
    vjp(RevSweep)  : jax.vjp at the STASHED hs — primal is only the reverse
                     sweep (L matmuls); all second-order structure (the
                     sigma'' coupling) falls out mechanically because the
                     gates are recomputed elementwise from h
                     (sigmoid(100 z) = 1 - exp(-100 softplus(100 z)/100))
    vjp(Heads)     : two head matmuls
    vjp(Fwd)       : hand-derived first-order z-chain at the stashed hs

for ~5L matmul passes — the forward-chain recompute is gone, traded against
one HBM round trip of the stash (8 x [N, 256] bf16 = 268 MB at the flagship
65k points).  Validated bit-for-bit against ``jax.vjp(sdf_core_ref)`` in
f32-stash interpret mode (tests/test_core_stash.py).

Reference parity target unchanged: ``fields/sdf_field.py:136-148`` (the
double-backward normals) — this is purely an execution-schedule change.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nrhints_tpu.fields.sdf import SDFNetConfig, _layer_dims
from nrhints_tpu.kernels.common import INV_SQRT2, softplus100_gate
from nrhints_tpu.kernels.core_mlp import (
    _dot,
    _dot_t,
    _pad_rows,
    _row_spec,
    _weight_specs,
    materialize_mlp_weights,
    materialize_sdf_weights_full,
)


def _gate_from_h(h):
    """sigmoid(100 z) recovered from h = softplus(100 z)/100 (elementwise)."""
    return 1.0 - jnp.exp(-100.0 * h)


def _encode(x, cfg: SDFNetConfig):
    F, d_in = cfg.multi_res, cfg.d_in
    xs = x * cfg.scale
    sblocks = [xs[:, d : d + 1] * (2.0 ** f) for d in range(d_in) for f in range(F)]
    scaled = jnp.concatenate(sblocks, axis=-1)
    sin_b = jnp.sin(scaled)
    cos_b = jnp.sin(scaled + jnp.pi / 2.0)
    return jnp.concatenate([xs, sin_b, cos_b], axis=-1), sin_b, cos_b


def sdf_core_fwd_hs_ref(weights, x, cfg: SDFNetConfig, compute_dtype="float32",
                        return_us=False):
    """Forward + reverse sweep, ALSO returning the per-layer activations hs
    (and, with ``return_us``, the reverse-sweep values u_i — the g just
    before each layer's gate multiply — plus the final g_enc).  Outputs
    match ``sdf_core_ref`` exactly (same op order)."""
    cdt = None if compute_dtype == "float32" else jnp.dtype(compute_dtype)
    L = cfg.n_layers
    io, _ = _layer_dims(cfg)
    enc, sin_b, cos_b = _encode(x, cfg)
    d0 = enc.shape[-1]

    h = enc
    hs = []
    gates = []
    for i in range(L):
        if i in cfg.skip_in:
            h = jnp.concatenate([h, enc], axis=-1) * INV_SQRT2
        z = _dot(h, weights[2 * i], cdt) + weights[2 * i + 1]
        h, gate = softplus100_gate(z)
        hs.append(h)
        gates.append(gate)

    L2 = 2 * L
    w_sdf, b_sdf = weights[L2], weights[L2 + 1]
    w_feat, b_feat = weights[L2 + 2], weights[L2 + 3]
    sdf = (_dot(h, w_sdf, cdt) + b_sdf) / cfg.scale
    feat = _dot(h, w_feat, cdt) + b_feat

    m = x.shape[0]
    g = (jnp.transpose(w_sdf) + jnp.zeros((m, 1), enc.dtype)) / cfg.scale
    g_enc = jnp.zeros_like(enc)
    us = [None] * L
    for i in reversed(range(L)):
        us[i] = g
        g = g * gates[i]
        g = _dot_t(g, weights[2 * i], cdt)
        if i in cfg.skip_in:
            g = g * INV_SQRT2
            split = io[i][0] - d0
            g_enc = g_enc + g[:, split:]
            g = g[:, :split]
    g_enc = g_enc + g
    gx = _tail(g_enc, sin_b, cos_b, cfg)
    if return_us:
        return sdf[:, 0:1], feat, gx, hs, us, g_enc
    return sdf[:, 0:1], feat, gx, hs


def _tail(g_enc, sin_b, cos_b, cfg: SDFNetConfig):
    """g_enc -> gx through the encoding chain (elementwise)."""
    F, d_in = cfg.multi_res, cfg.d_in
    gx = g_enc[:, :d_in]
    g_sin = g_enc[:, d_in : d_in + d_in * F]
    g_cos = g_enc[:, d_in + d_in * F :]
    dS = g_sin * cos_b - g_cos * sin_b
    per_dim = []
    for d in range(d_in):
        acc = dS[:, d * F : d * F + 1]
        for f in range(1, F):
            acc = acc + dS[:, d * F + f : d * F + f + 1] * (2.0 ** f)
        per_dim.append(acc)
    gx = gx + jnp.concatenate(per_dim, axis=-1)
    return gx * cfg.scale


def _rev_sweep(weights, hs, enc, cfg: SDFNetConfig, cdt):
    """Stashed hs -> g_enc (gates recomputed elementwise from h)."""
    L = cfg.n_layers
    io, _ = _layer_dims(cfg)
    d0 = enc.shape[-1]
    m = hs[0].shape[0]
    w_sdf = weights[2 * L]
    g = (jnp.transpose(w_sdf) + jnp.zeros((m, 1), jnp.float32)) / cfg.scale
    g_enc = jnp.zeros((m, d0), jnp.float32)
    for i in reversed(range(L)):
        g = g * _gate_from_h(hs[i])
        g = _dot_t(g, weights[2 * i], cdt)
        if i in cfg.skip_in:
            g = g * INV_SQRT2
            split = io[i][0] - d0
            g_enc = g_enc + g[:, split:]
            g = g[:, :split]
    return g_enc + g


def sdf_core_bwd_stash_ref(weights, x, hs, cots, cfg: SDFNetConfig, compute_dtype="float32"):
    """Backward at stashed hs -> (dws tuple, dx).  ~5L matmul passes."""
    cdt = None if compute_dtype == "float32" else jnp.dtype(compute_dtype)
    ds, df, dgx = cots
    L = cfg.n_layers
    io, _ = _layer_dims(cfg)
    enc, sin_b, cos_b = _encode(x, cfg)
    d0 = enc.shape[-1]

    # 1) RevSweep primal (needed by Tail's vjp) + its vjp at stashed hs.
    (g_enc, rev_vjp) = jax.vjp(
        lambda ws, hh: _rev_sweep(ws, hh, enc, cfg, cdt), list(weights), list(hs)
    )
    # 2) Tail vjp (elementwise; sin/cos enter multiplicatively).
    (_, tail_vjp) = jax.vjp(
        lambda ge, sb, cb: _tail(ge, sb, cb, cfg), g_enc, sin_b, cos_b
    )
    d_genc, d_sin_t, d_cos_t = tail_vjp(dgx)
    dws_r, dhs_r = rev_vjp(d_genc)

    # 3) Heads vjp (hand: two matmuls each way).
    L2 = 2 * L
    h_L = hs[L - 1]
    ds_s = ds / cfg.scale
    dws = list(dws_r)
    dws[L2] = dws[L2] + _dot(jnp.transpose(h_L), ds_s, cdt)
    dws[L2 + 1] = dws[L2 + 1] + jnp.sum(ds_s, axis=0, keepdims=True)
    dws[L2 + 2] = dws[L2 + 2] + _dot(jnp.transpose(h_L), df, cdt)
    dws[L2 + 3] = dws[L2 + 3] + jnp.sum(df, axis=0, keepdims=True)
    dh_L = _dot_t(ds_s, weights[L2], cdt) + _dot_t(df, weights[L2 + 2], cdt)

    # 4) Fwd hand-vjp: z-chain at stashed hs with injected cotangents.
    G = dh_L + dhs_r[L - 1]
    d_enc = jnp.zeros_like(enc)
    gprev = None
    for i in reversed(range(L)):
        Gz = G * _gate_from_h(hs[i])  # cot of z_i
        if i in cfg.skip_in:
            inp = jnp.concatenate([hs[i - 1], enc], axis=-1) * INV_SQRT2
        elif i == 0:
            inp = enc
        else:
            inp = hs[i - 1]
        dws[2 * i] = dws[2 * i] + _dot(jnp.transpose(inp), Gz, cdt)
        dws[2 * i + 1] = dws[2 * i + 1] + jnp.sum(Gz, axis=0, keepdims=True)
        gprev = _dot_t(Gz, weights[2 * i], cdt)
        if i in cfg.skip_in:
            gprev = gprev * INV_SQRT2
            split = io[i][0] - d0
            d_enc = d_enc + gprev[:, split:]
            gprev = gprev[:, :split]
        if i > 0:
            G = gprev + dhs_r[i - 1]
    d_enc = d_enc + gprev

    # 5) Encoding chain -> dx.  d_enc covers the forward/reverse sweeps' use
    # of enc; d_sin_t/d_cos_t are the Tail's direct sin/cos terms.
    d_in = cfg.d_in
    F = cfg.multi_res
    d_xs = d_enc[:, :d_in]
    e_sin = d_enc[:, d_in : d_in + d_in * F] + d_sin_t
    e_cos = d_enc[:, d_in + d_in * F :] + d_cos_t
    dS = e_sin * cos_b - e_cos * sin_b
    per_dim = []
    for d in range(d_in):
        acc = dS[:, d * F : d * F + 1]
        for f in range(1, F):
            acc = acc + dS[:, d * F + f : d * F + f + 1] * (2.0 ** f)
        per_dim.append(acc)
    dxs = d_xs + jnp.concatenate(per_dim, axis=-1)
    dx = dxs * cfg.scale  # xs = x * scale
    return tuple(dws), dx


def sdf_core_bwd_stash_all_ref(
    weights, x, hs, us, g_enc, cots, cfg: SDFNetConfig, compute_dtype="float32"
):
    """Backward with hs AND the reverse-sweep (us, g_enc) stashed — the
    RevSweep primal is free, leaving ~4L matmul passes:

      Tail vjp (elementwise, at stashed g_enc)
      hand RevSweep vjp at stashed us  (v-chain L + dW outers L)
      Heads vjp (2 matmuls each way)
      hand Fwd z-chain vjp at stashed hs  (2L)
    """
    cdt = None if compute_dtype == "float32" else jnp.dtype(compute_dtype)
    ds, df, dgx = cots
    L = cfg.n_layers
    io, _ = _layer_dims(cfg)
    enc, sin_b, cos_b = _encode(x, cfg)
    d0 = enc.shape[-1]
    gates = [_gate_from_h(h) for h in hs]

    # 1) Tail vjp at the stashed g_enc.
    (_, tail_vjp) = jax.vjp(
        lambda ge, sb, cb: _tail(ge, sb, cb, cfg), g_enc, sin_b, cos_b
    )
    d_genc, d_sin_t, d_cos_t = tail_vjp(dgx)

    # 2) Hand RevSweep vjp at stashed us: the cotangent of the sweep's g
    # stream propagates in ASCENDING layer order (validated vs
    # jax.vjp(_rev_sweep) at 1e-7 rel — see the round-4 derivation).
    dws = [jnp.zeros_like(w) for w in weights]
    dhs_r = [None] * L
    carry = d_genc
    for i in range(L):
        v_r = carry
        if i in cfg.skip_in:
            v_r = jnp.concatenate([carry, d_genc], axis=-1) * INV_SQRT2
        t_i = us[i] * gates[i]
        dws[2 * i] = dws[2 * i] + _dot(jnp.transpose(v_r), t_i, cdt)
        dt = _dot(v_r, weights[2 * i], cdt)
        dhs_r[i] = dt * us[i] * (100.0 * (1.0 - gates[i]))
        carry = dt * gates[i]
    L2 = 2 * L
    dws[L2] = dws[L2] + (jnp.sum(carry, axis=0) / cfg.scale)[:, None]

    # 3) Heads.
    h_L = hs[L - 1]
    ds_s = ds / cfg.scale
    dws[L2] = dws[L2] + _dot(jnp.transpose(h_L), ds_s, cdt)
    dws[L2 + 1] = dws[L2 + 1] + jnp.sum(ds_s, axis=0, keepdims=True)
    dws[L2 + 2] = dws[L2 + 2] + _dot(jnp.transpose(h_L), df, cdt)
    dws[L2 + 3] = dws[L2 + 3] + jnp.sum(df, axis=0, keepdims=True)
    dh_L = _dot_t(ds_s, weights[L2], cdt) + _dot_t(df, weights[L2 + 2], cdt)

    # 4) Fwd hand-vjp (identical to the hs-stash variant).
    G = dh_L + dhs_r[L - 1]
    d_enc = jnp.zeros_like(enc)
    gprev = None
    for i in reversed(range(L)):
        Gz = G * gates[i]
        if i in cfg.skip_in:
            inp = jnp.concatenate([hs[i - 1], enc], axis=-1) * INV_SQRT2
        elif i == 0:
            inp = enc
        else:
            inp = hs[i - 1]
        dws[2 * i] = dws[2 * i] + _dot(jnp.transpose(inp), Gz, cdt)
        dws[2 * i + 1] = dws[2 * i + 1] + jnp.sum(Gz, axis=0, keepdims=True)
        gprev = _dot_t(Gz, weights[2 * i], cdt)
        if i in cfg.skip_in:
            gprev = gprev * INV_SQRT2
            split = io[i][0] - d0
            d_enc = d_enc + gprev[:, split:]
            gprev = gprev[:, :split]
        if i > 0:
            G = gprev + dhs_r[i - 1]
    d_enc = d_enc + gprev

    # 5) Encoding chain -> dx.
    d_in = cfg.d_in
    F = cfg.multi_res
    d_xs = d_enc[:, :d_in]
    e_sin = d_enc[:, d_in : d_in + d_in * F] + d_sin_t
    e_cos = d_enc[:, d_in + d_in * F :] + d_cos_t
    dS = e_sin * cos_b - e_cos * sin_b
    per_dim = []
    for d in range(d_in):
        acc = dS[:, d * F : d * F + 1]
        for f in range(1, F):
            acc = acc + dS[:, d * F + f : d * F + f + 1] * (2.0 ** f)
        per_dim.append(acc)
    dxs = d_xs + jnp.concatenate(per_dim, axis=-1)
    return tuple(dws), dxs * cfg.scale


# ---------------------------------------------------------------------------
# Pallas plumbing: custom-VJP op with stashed-activation backward


def _stash_widths(cfg: SDFNetConfig):
    io, _ = _layer_dims(cfg)
    return [do for (_, do) in io]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sdf_stash_op(opts, weights, x):
    # Undifferentiated primal (eval/inference renders): dispatch the
    # NON-stash forward kernel — XLA cannot DCE unused outputs of an opaque
    # pallas_call, so the stashing kernel here would write (and discard)
    # the full per-layer activation stash to HBM.  The stash-writing
    # forward runs only on the fwd-for-grad path (``_sdf_stash_fwd``).
    from nrhints_tpu.kernels.core_mlp import _sdf_core_fwd_pallas

    cfg, bp, bp_bwd, interpret, compute_dtype = opts[:5]
    return _sdf_core_fwd_pallas((cfg, bp, bp_bwd, interpret, compute_dtype), weights, x)


def _sdf_stash_fwd(opts, weights, x):
    out, hs = _sdf_stash_fwd_pallas(opts, weights, x)
    return out, (weights, x, hs)


def _sdf_stash_bwd(opts, res, cots):
    weights, x, hs = res
    if len(opts) > 7 and opts[7] == "xla":
        # Full-batch XLA backward: the SAME jnp program the Pallas backward
        # kernel executes per block, compiled by XLA over all points at
        # once — the dL/dW outer products become K=N_points matmuls (the
        # march-sweep lesson of PROFILE.md round-5 applied to the
        # backward).  No grid, no per-block dW accumulation.
        cfg = opts[0]
        compute_dtype = opts[4]
        sv = [h.astype(jnp.float32) for h in hs]
        d_sdf, d_feat, d_gx = cots
        dws, dx = sdf_core_bwd_stash_ref(
            list(weights), x, sv, (d_sdf.reshape(-1, 1), d_feat, d_gx),
            cfg, compute_dtype,
        )
        return tuple(dws), dx
    return _sdf_stash_bwd_pallas(opts, weights, x, hs, cots)


_sdf_stash_op.defvjp(_sdf_stash_fwd, _sdf_stash_bwd)


def _sdf_stash_fwd_pallas(opts, weights, x):
    cfg, bp, _bp_bwd, interpret, compute_dtype, stash_dtype, stash_us = opts[:7]
    (x_p,), n, n_blocks = _pad_rows([x], bp)
    n_w = len(weights)
    d_feat = cfg.d_out_feat
    widths = _stash_widths(cfg)
    sdt = jnp.dtype(stash_dtype)
    d0 = cfg.d_encoded
    L = cfg.n_layers

    def kernel(x_ref, *refs):
        w_refs, out_refs = refs[:n_w], refs[n_w:]
        ws = [r[:] for r in w_refs]
        if stash_us:
            sdf, feat, gx, hs, us, g_enc = sdf_core_fwd_hs_ref(
                ws, x_ref[:], cfg, compute_dtype, return_us=True
            )
            extras = hs + us + [g_enc]
        else:
            sdf, feat, gx, hs = sdf_core_fwd_hs_ref(ws, x_ref[:], cfg, compute_dtype)
            extras = hs
        out_refs[0][:] = sdf
        out_refs[1][:] = feat
        out_refs[2][:] = gx
        for r, v in zip(out_refs[3:], extras):
            r[:] = v.astype(sdt)

    extra_widths = list(widths)
    if stash_us:
        extra_widths += list(widths) + [d0]
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[_row_spec(bp, 3), *_weight_specs(weights)],
        out_specs=(
            _row_spec(bp, 1),
            _row_spec(bp, d_feat),
            _row_spec(bp, 3),
            *[_row_spec(bp, w) for w in extra_widths],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * bp, d_feat), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * bp, 3), jnp.float32),
            *[jax.ShapeDtypeStruct((n_blocks * bp, w), sdt) for w in extra_widths],
        ),
        interpret=interpret,
    )(x_p, *weights)
    sdf, feat, gx = outs[0][:n, 0], outs[1][:n], outs[2][:n]
    extras = [h[:n] for h in outs[3:]]
    return (sdf, feat, gx), extras


def _sdf_stash_bwd_pallas(opts, weights, x, stash, cots):
    cfg, _bp_fwd, bp, interpret, compute_dtype, _stash_dtype, stash_us = opts[:7]
    d_sdf, d_feat_c, d_gx = cots
    d_feat_dim = cfg.d_out_feat
    widths = _stash_widths(cfg)
    d0 = cfg.d_encoded
    (x_p, ds_p, df_p, dg_p, *stash_p), n, n_blocks = _pad_rows(
        [x, d_sdf.reshape(-1, 1), d_feat_c, d_gx, *stash], bp
    )
    if n_blocks * bp != n:
        row = jnp.arange(n_blocks * bp)[:, None]
        keep = (row < n).astype(jnp.float32)
        ds_p, df_p, dg_p = ds_p * keep, df_p * keep, dg_p * keep

    n_w = len(weights)
    L = cfg.n_layers
    n_stash = len(stash)

    def kernel(x_ref, ds_ref, df_ref, dg_ref, *refs):
        s_refs = refs[:n_stash]
        w_refs = refs[n_stash : n_stash + n_w]
        dw_refs = refs[n_stash + n_w : n_stash + 2 * n_w]
        dx_ref = refs[n_stash + 2 * n_w]
        ws = [r[:] for r in w_refs]
        sv = [r[:].astype(jnp.float32) for r in s_refs]
        cot = (ds_ref[:], df_ref[:], dg_ref[:])
        if stash_us:
            hh, uu, g_enc = sv[:L], sv[L : 2 * L], sv[2 * L]
            dws, dx = sdf_core_bwd_stash_all_ref(
                ws, x_ref[:], hh, uu, g_enc, cot, cfg, compute_dtype
            )
        else:
            dws, dx = sdf_core_bwd_stash_ref(
                ws, x_ref[:], sv, cot, cfg, compute_dtype
            )

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r, dw in zip(dw_refs, dws):
                r[:] = dw

        @pl.when(pl.program_id(0) > 0)
        def _():
            for r, dw in zip(dw_refs, dws):
                r[:] = r[:] + dw

        dx_ref[:] = dx

    stash_widths = list(widths)
    if stash_us:
        stash_widths += list(widths) + [d0]
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            _row_spec(bp, 3),
            _row_spec(bp, 1),
            _row_spec(bp, d_feat_dim),
            _row_spec(bp, 3),
            *[_row_spec(bp, w) for w in stash_widths],
            *_weight_specs(weights),
        ],
        out_specs=(*_weight_specs(weights), _row_spec(bp, 3)),
        out_shape=(
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
            jax.ShapeDtypeStruct((n_blocks * bp, 3), jnp.float32),
        ),
        interpret=interpret,
    )(x_p, ds_p, df_p, dg_p, *stash_p, *weights)
    dws, dx = outs[:n_w], outs[n_w]
    return tuple(dws), dx[:n]


def fused_sdf_value_feat_grad_stash(
    params: dict,
    cfg: SDFNetConfig,
    x: jnp.ndarray,
    *,
    block_pts: int = 256,
    block_pts_bwd: int = 128,
    interpret: bool = False,
    compute_dtype: str = "bfloat16",
    stash_dtype: str = "bfloat16",
    stash_us: bool = False,
    bwd_impl: str = "pallas",
):
    """Stash-backward twin of ``fused_sdf_value_feat_grad`` (same outputs,
    same forward numerics; backward reads stashed activations instead of
    recomputing the forward chain).  ``stash_us`` additionally stashes the
    reverse-sweep values (u_i, g_enc) so the backward skips the RevSweep
    primal too (~4L matmul passes vs ~5L) at double the stash traffic.
    ``bwd_impl="xla"`` runs the stashed backward as full-batch XLA instead
    of the block-gridded Pallas kernel (see ``_sdf_stash_bwd``)."""
    weights = materialize_sdf_weights_full(params, cfg)
    opts = (
        cfg, block_pts, block_pts_bwd, interpret, compute_dtype,
        stash_dtype, stash_us, bwd_impl,
    )
    sdf, feat, gx = _sdf_stash_op(opts, weights, x)
    return sdf, feat, gx


# ---------------------------------------------------------------------------
# Stash variant of the generic ReLU MLP (reflectance trunk)


def mlp_relu_fwd_zs_ref(weights, x, n_layers, compute_dtype="float32"):
    """Forward returning (out, zs): zs are the hidden pre-activations."""
    cdt = None if compute_dtype == "float32" else jnp.dtype(compute_dtype)
    h = x
    zs = []
    for i in range(n_layers + 1):
        h = _dot(h, weights[2 * i], cdt) + weights[2 * i + 1]
        if i < n_layers:
            zs.append(h)
            h = jnp.maximum(h, 0.0)
    return h, zs


def mlp_relu_bwd_stash_ref(weights, x, zs, g, n_layers, compute_dtype="float32"):
    """Hand backward of the ReLU MLP at stashed pre-activations."""
    cdt = None if compute_dtype == "float32" else jnp.dtype(compute_dtype)
    dws = []
    G = g
    for i in reversed(range(n_layers + 1)):
        inp = x if i == 0 else jnp.maximum(zs[i - 1], 0.0)
        if i < n_layers:
            G = G * (zs[i] > 0.0).astype(G.dtype)
        dws.append(jnp.sum(G, axis=0, keepdims=True))  # bias
        dws.append(_dot(jnp.transpose(inp), G, cdt))  # weight
        G = _dot_t(G, weights[2 * i], cdt)
    dws.reverse()
    return tuple(dws), G


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mlp_stash_op(opts, weights, x):
    # Undifferentiated primal: non-stash forward kernel (see _sdf_stash_op).
    from nrhints_tpu.kernels.core_mlp import _mlp_fwd_pallas

    n_layers, bp, bp_bwd, interpret, compute_dtype = opts[:5]
    return _mlp_fwd_pallas((n_layers, bp, bp_bwd, interpret, compute_dtype), weights, x)


def _mlp_stash_fwd(opts, weights, x):
    out, zs = _mlp_stash_fwd_pallas(opts, weights, x)
    return out, (weights, x, zs)


def _mlp_stash_bwd(opts, res, g):
    weights, x, zs = res
    if len(opts) > 6 and opts[6] == "xla":
        # Full-batch XLA backward (see _sdf_stash_bwd).
        n_layers = opts[0]
        compute_dtype = opts[4]
        zz = [z.astype(jnp.float32) for z in zs]
        dws, dx = mlp_relu_bwd_stash_ref(
            list(weights), x, zz, g, n_layers, compute_dtype
        )
        return tuple(dws), dx
    return _mlp_stash_bwd_pallas(opts, weights, x, zs, g)


_mlp_stash_op.defvjp(_mlp_stash_fwd, _mlp_stash_bwd)


def _mlp_stash_fwd_pallas(opts, weights, x):
    n_layers, bp, _bp_bwd, interpret, compute_dtype, stash_dtype = opts[:6]
    (x_p,), n, n_blocks = _pad_rows([x], bp)
    d0 = x.shape[-1]
    d_out = weights[-2].shape[-1]
    n_w = len(weights)
    widths = [weights[2 * i].shape[-1] for i in range(n_layers)]
    sdt = jnp.dtype(stash_dtype)

    def kernel(x_ref, *refs):
        w_refs, out_refs = refs[:n_w], refs[n_w:]
        ws = [r[:] for r in w_refs]
        out, zs = mlp_relu_fwd_zs_ref(ws, x_ref[:], n_layers, compute_dtype)
        out_refs[0][:] = out
        for r, z in zip(out_refs[1:], zs):
            r[:] = z.astype(sdt)

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[_row_spec(bp, d0), *_weight_specs(weights)],
        out_specs=(
            _row_spec(bp, d_out),
            *[_row_spec(bp, w) for w in widths],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * bp, d_out), jnp.float32),
            *[jax.ShapeDtypeStruct((n_blocks * bp, w), sdt) for w in widths],
        ),
        interpret=interpret,
    )(x_p, *weights)
    return outs[0][:n], [z[:n] for z in outs[1:]]


def _mlp_stash_bwd_pallas(opts, weights, x, zs, g):
    n_layers, _bp_fwd, bp, interpret, compute_dtype, _sdt = opts[:6]
    (x_p, g_p, *zs_p), n, n_blocks = _pad_rows([x, g, *zs], bp)
    if n_blocks * bp != n:
        row = jnp.arange(n_blocks * bp)[:, None]
        g_p = g_p * (row < n).astype(jnp.float32)
    d0 = x.shape[-1]
    d_out = weights[-2].shape[-1]
    n_w = len(weights)
    widths = [weights[2 * i].shape[-1] for i in range(n_layers)]

    def kernel(x_ref, g_ref, *refs):
        z_refs = refs[:n_layers]
        w_refs = refs[n_layers : n_layers + n_w]
        dw_refs, dx_ref = refs[n_layers + n_w : n_layers + 2 * n_w], refs[n_layers + 2 * n_w]
        ws = [r[:] for r in w_refs]
        zz = [r[:].astype(jnp.float32) for r in z_refs]
        dws, dx = mlp_relu_bwd_stash_ref(
            ws, x_ref[:], zz, g_ref[:], n_layers, compute_dtype
        )

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
        in_specs=[
            _row_spec(bp, d0),
            _row_spec(bp, d_out),
            *[_row_spec(bp, w) for w in widths],
            *_weight_specs(weights),
        ],
        out_specs=(*_weight_specs(weights), _row_spec(bp, d0)),
        out_shape=(
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
            jax.ShapeDtypeStruct((n_blocks * bp, d0), jnp.float32),
        ),
        interpret=interpret,
    )(x_p, g_p, *zs_p, *weights)
    return tuple(outs[:n_w]), outs[n_w][:n]


def fused_mlp_apply_stash(
    params: dict,
    n_layers: int,
    x: jnp.ndarray,
    *,
    block_pts: int = 512,
    block_pts_bwd: int = 256,
    interpret: bool = False,
    compute_dtype: str = "bfloat16",
    stash_dtype: str = "bfloat16",
    bwd_impl: str = "pallas",
) -> jnp.ndarray:
    """Stash-backward twin of ``fused_mlp_apply``."""
    weights = materialize_mlp_weights(params, n_layers)
    opts = (
        n_layers, block_pts, block_pts_bwd, interpret, compute_dtype,
        stash_dtype, bwd_impl,
    )
    return _mlp_stash_op(opts, weights, x)
