"""Fused Pallas TPU kernels for the hierarchical SDF marches.

Two kernels built from one shared round body:

* ``fused_importance_z`` — the 4-round NeuS importance refinement of the
  primary ray march (replaces ``_importance_sample_z``'s XLA graph).
* ``fused_shadow_tau`` — the full shadow-hint march: 4 refinement rounds
  plus the final SDF + directional-derivative sweep and transmittance
  accumulation, returning one tau per shadow ray (replaces
  ``_shadow_transmittance``).

TPU-shaped design (see kernels/common.py):
* samples live in the 128-lane axis; every round works on a fixed [BR, 128]
  tile with +BIG padding and validity masks, so all shapes are uniform;
* sorted merges are 7-stage bitonic butterflies (rolls + selects) — the new
  samples are generated in DESCENDING order (descending inverse-CDF u) so
  [old_asc | pad | new_desc] is already bitonic;
* prefix sums/products are triangular-ones matmuls on the MXU;
* inverse-CDF indices come from comparison counting, gathers from one-hot
  reductions — no dynamic gather/scatter anywhere;
* the in-kernel MLP keeps points as a 3-D [BR, S, F] activation (Mosaic
  batched dot), so no lane<->sublane reshapes are needed;
* the shadow march's cosine term is a single hand-rolled forward-mode
  tangent through the MLP (softplus' = sigmoid).

Everything here is inference-only (the marches are no-grad in the reference
too: ``models/neus_hint_model.py:696,379``); callers stop gradients.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nrhints_tpu.fields.sdf import SDFNetConfig
from nrhints_tpu.kernels.common import INV_SQRT2, materialize_sdf_weights, softplus100_gate

BIG_Z = 1e9  # padding depth; must exceed any real depth
N_BUF = 128  # lane width of the z/sdf buffers (64 strat + 64 importance)


# ---------------------------------------------------------------------------
# In-kernel MLP on [BR, S, *] activations


def _pe_3d(pts: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """[BR, S, 3] -> [BR, S, 3 + 6*num_freqs], dim-major like nerf_encoding."""
    parts = []
    for d in range(3):
        for f in range(num_freqs):
            parts.append(pts[..., d : d + 1] * (2.0 ** f))
    scaled = jnp.concatenate(parts, axis=-1)
    return jnp.concatenate(
        [pts, jnp.sin(scaled), jnp.sin(scaled + jnp.pi / 2.0)], axis=-1
    )


def _pe_3d_with_tangent(pts, tans, num_freqs):
    xp, tp = [], []
    for d in range(3):
        for f in range(num_freqs):
            xp.append(pts[..., d : d + 1] * (2.0 ** f))
            tp.append(tans[..., d : d + 1] * (2.0 ** f))
    scaled = jnp.concatenate(xp, axis=-1)
    tscaled = jnp.concatenate(tp, axis=-1)
    sin_b = jnp.sin(scaled)
    cos_b = jnp.sin(scaled + jnp.pi / 2.0)
    enc = jnp.concatenate([pts, sin_b, cos_b], axis=-1)
    tenc = jnp.concatenate([tans, tscaled * cos_b, -tscaled * sin_b], axis=-1)
    return enc, tenc


def _dot3(x, w):
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _softplus100(x):
    return jax.nn.softplus(100.0 * x) * 0.01


def _mlp_sdf_3d(pts, weights, cfg: SDFNetConfig):
    """[BR, S, 3] raw points -> [BR, S] sdf (weights: list of (w [in,out],
    b [1,out]) pairs then the sdf head).

    Matmuls run in the weights' dtype (bf16 by default — these evals only
    steer sampling, never carry gradients) with f32 accumulation; all
    nonlinearities and z math stay f32.

    The hidden layers run on a FLATTENED [BR*S, F] activation: a batched
    3-D dot lowers to BR separate [S, K]x[K, N] matmuls, and with the
    refinement rounds' S=16 that is 16/128 MXU row utilization.  Collapsing
    the two leading dims keeps the minor (lane) axis intact — a legal,
    layout-preserving Mosaic reshape when S is a multiple of the sublane
    tile — and turns each layer into one full-row [BR*S, K]x[K, N] matmul.
    Only the tiny sdf head stays 3-D so the result lands as [BR, S] lanes."""
    wdt = weights[0].dtype
    br, s = pts.shape[0], pts.shape[1]
    xs = pts * cfg.scale
    enc = _pe_3d(xs, cfg.multi_res).reshape(br * s, -1)
    h = enc.astype(wdt)
    for i in range(cfg.n_layers):
        if i in cfg.skip_in:
            h = (jnp.concatenate([h.astype(jnp.float32), enc], axis=-1) * INV_SQRT2).astype(wdt)
        w, b = weights[2 * i], weights[2 * i + 1]
        h = _softplus100(_dot3(h, w) + b).astype(wdt)
    w, b = weights[-2], weights[-1]
    h3 = h.reshape(br, s, h.shape[-1])
    return ((_dot3(h3, w) + b[None]) / cfg.scale)[..., 0]


def _mlp_sdf_dirderiv_3d(pts, dirs, weights, cfg: SDFNetConfig):
    """-> (sdf [BR, S], dirs . grad sdf [BR, S]) with one tangent stream.

    Hidden layers run flattened to [BR*S, F] for full MXU rows (see
    ``_mlp_sdf_3d``); both heads stay 3-D so results land as [BR, S]."""
    wdt = weights[0].dtype
    br, s = pts.shape[0], pts.shape[1]
    xs = pts * cfg.scale
    ts = dirs * cfg.scale
    enc, tenc = _pe_3d_with_tangent(xs, ts, cfg.multi_res)
    enc = enc.reshape(br * s, -1)
    tenc = tenc.reshape(br * s, -1)
    h, th = enc.astype(wdt), tenc.astype(wdt)
    for i in range(cfg.n_layers):
        if i in cfg.skip_in:
            h = (jnp.concatenate([h.astype(jnp.float32), enc], axis=-1) * INV_SQRT2).astype(wdt)
            th = (jnp.concatenate([th.astype(jnp.float32), tenc], axis=-1) * INV_SQRT2).astype(wdt)
        w, b = weights[2 * i], weights[2 * i + 1]
        z = _dot3(h, w) + b
        sp, gate = softplus100_gate(z)
        th = (_dot3(th, w) * gate).astype(wdt)
        h = sp.astype(wdt)
    w, b = weights[-2], weights[-1]
    h3 = h.astype(wdt).reshape(br, s, h.shape[-1])
    th3 = th.reshape(br, s, th.shape[-1])
    sdf = ((_dot3(h3, w) + b[None]) / cfg.scale)[..., 0]
    dsdf = (_dot3(th3, w) / cfg.scale)[..., 0]
    return sdf, dsdf


# ---------------------------------------------------------------------------
# Lane-axis helpers


def _roll(x, shift, axis=1):
    """pltpu.roll with negative shifts mapped to n - |shift| (out[k] = x[k - shift])."""
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis=axis)


def _tri_matmul_cumsum(x, exclusive=False):
    n = x.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri = (i < j if exclusive else i <= j).astype(x.dtype)
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def _bitonic_merge(z, payload):
    br, n = z.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (br, n), 1)
    for d in (64, 32, 16, 8, 4, 2, 1):
        hi = (idx & d) != 0
        p = jnp.where(hi, _roll(z, d, axis=1), _roll(z, -d, axis=1))
        # select_n on i1 vectors is unsupported in Mosaic; use mask algebra.
        take = jnp.logical_or(
            jnp.logical_and(hi, p > z), jnp.logical_and(jnp.logical_not(hi), p < z)
        )
        p_pay = jnp.where(
            hi, _roll(payload, d, axis=1), _roll(payload, -d, axis=1)
        )
        payload = jnp.where(take, p_pay, payload)
        z = jnp.where(take, p, z)
    return z, payload


def _onehot_gather(values, inds):
    """values [BR, N] at inds [BR, K] -> [BR, K]."""
    n = values.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (*inds.shape, n), inds.ndim)
    onehot = (lane == inds[..., None]).astype(values.dtype)
    return jnp.sum(onehot * values[:, None, :], axis=-1)


def _onehot_gather_many(value_list, inds):
    """Gather several [BR, N] value tensors at one shared [BR, K] index set,
    building the (expensive [BR, K, N]) one-hot mask ONCE."""
    n = value_list[0].shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (*inds.shape, n), inds.ndim)
    onehot = (lane == inds[..., None]).astype(value_list[0].dtype)
    return [jnp.sum(onehot * v[:, None, :], axis=-1) for v in value_list]


def _rank_merge(z, payload, n_new: int):
    """Merge [BR, 128] = [old(128-n_new, ascending incl BIG_Z pad) |
    new(n_new, descending)] by comparison-count ranks instead of the
    7-stage bitonic butterfly (VERDICT r3 Next #4).

    Old elements move RIGHT by s_i = #{new < old_i} (monotone
    non-decreasing, <= n_new), realized as a log2(n_new)+1-stage variable
    shift network with a validity stream (an element departs its lane when
    it moves; monotonicity makes arrivals collision-free, and no move can
    overshoot its final rank so lane-wrap never produces a live arrival).
    New elements land by a one-hot scatter at their ranks.  Tie ranks match
    a stable old-before-new merge; tied z values make the z output
    order-independent, so this is interchangeable with the bitonic merge.
    """
    br, n = z.shape
    k = n - n_new
    old_z, new_z = z[:, :k], z[:, k:]
    old_p, new_p = payload[:, :k], payload[:, k:]

    # Shift counts for old (strict <: old goes first on ties) and ranks for
    # new (<=: pushed after equal old; descending new => base rank 15-j).
    s_old = jnp.sum(
        (new_z[:, None, :] < old_z[:, :, None]).astype(jnp.float32), axis=-1
    )  # [BR, k] in [0, n_new]
    cnt_new = jnp.sum(
        (old_z[:, None, :] <= new_z[:, :, None]).astype(jnp.float32), axis=-1
    )  # [BR, n_new]
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (br, n_new), 1).astype(jnp.float32)
    r_new = (n_new - 1.0) - j_iota + cnt_new  # [BR, n_new] ranks in [0, n)

    # Pad the old stream to n lanes; pad lanes are invalid (never move,
    # always overwritten by the final combine).
    pad = jnp.zeros((br, n_new), jnp.float32)
    v_z = jnp.concatenate([old_z, pad + BIG_Z], axis=-1)
    v_p = jnp.concatenate([old_p, pad], axis=-1)
    rem = jnp.concatenate([s_old, pad], axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, n), 1).astype(jnp.float32)
    valid = (lane < k).astype(jnp.float32)

    d = n_new
    while d >= 1:
        fd = float(d)
        pz = _roll(v_z, d, axis=1)
        pp = _roll(v_p, d, axis=1)
        pr = _roll(rem, d, axis=1)
        pv = _roll(valid, d, axis=1)
        arrive = jnp.logical_and(pv > 0.5, pr >= fd)
        depart = jnp.logical_and(valid > 0.5, rem >= fd)
        v_z = jnp.where(arrive, pz, v_z)
        v_p = jnp.where(arrive, pp, v_p)
        rem = jnp.where(arrive, pr - fd, rem)
        valid = jnp.where(arrive, 1.0, jnp.where(depart, 0.0, valid))
        d //= 2

    # Scatter the new elements at their ranks; every lane without an old
    # arrival is (exactly) a new-element destination or trailing pad.
    onehot = (r_new[:, :, None] == lane[:, None, :]).astype(jnp.float32)
    new_z_sc = jnp.sum(onehot * new_z[:, :, None], axis=1)
    new_p_sc = jnp.sum(onehot * new_p[:, :, None], axis=1)
    is_old = valid > 0.5
    return jnp.where(is_old, v_z, new_z_sc), jnp.where(is_old, v_p, new_p_sc)


def _round_new_z(z, sdf, valid_n, inv_s, oo, od, n_new: int):
    """One up-sample round on padded [BR, 128] buffers -> new_z [BR, n_new]
    in DESCENDING order.  Mirrors neus_up_sample + det sample_pdf."""
    br = z.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, N_BUF), 1)
    interval_valid = lane < (valid_n - 1)

    nxt_z = _roll(z, -1, axis=1)
    nxt_s = _roll(sdf, -1, axis=1)
    # radius^2 at samples k and k+1 from |o + d z|^2 = oo + 2 od z + z^2
    r2 = oo + 2.0 * od * z + z * z
    r2n = oo + 2.0 * od * nxt_z + nxt_z * nxt_z
    inside = jnp.logical_or(r2 < 1.0, r2n < 1.0).astype(z.dtype)

    mid_sdf = (sdf + nxt_s) * 0.5
    cos_val = (nxt_s - sdf) / (nxt_z - z + 1e-5)
    prev_cos = jnp.where(lane == 0, 0.0, _roll(cos_val, 1, axis=1))
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside

    dist = nxt_z - z
    prev_e = mid_sdf - cos_val * dist * 0.5
    next_e = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_e * inv_s)
    next_cdf = jax.nn.sigmoid(next_e * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    # Mathematically alpha <= 1, but one f32 ulp of rounding can push it
    # past 1 when both cdfs saturate — which would turn the log-space
    # cumprod below into NaN.  Clamp to the mathematical bound.
    alpha = jnp.minimum(alpha, 1.0)
    alpha = jnp.where(interval_valid, alpha, 0.0)

    # weights = alpha * exclusive-prod(1 - alpha + 1e-7)
    trans = jnp.exp(_tri_matmul_cumsum(jnp.log(1.0 - alpha + 1e-7), exclusive=True))
    w = alpha * trans

    # det inverse-CDF with descending u
    pdf = jnp.where(interval_valid, w + 1e-5, 0.0)
    pdf = pdf / jnp.sum(pdf, axis=-1, keepdims=True)
    cdf = _tri_matmul_cumsum(pdf, exclusive=True)  # [BR,128]; cdf[k]=sum_{j<k}
    cdf_cnt = jnp.where(lane < valid_n, cdf, 2.0)

    ku = jax.lax.broadcasted_iota(jnp.int32, (1, n_new), 1).astype(jnp.float32)
    u = 1.0 - ku / (n_new - 1)  # descending [1, n_new]
    cmp = cdf_cnt[:, None, :] <= u[0][None, :, None]  # [BR, n_new, 128]
    inds = jnp.sum(cmp.astype(jnp.int32), axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, valid_n - 1)

    # One [BR, n_new, 128] one-hot per index set, shared by the cdf and z
    # gathers (the construction dominates the gather cost on the VPU).
    cdf_b, z_b = _onehot_gather_many([cdf, z], below)
    cdf_a, z_a = _onehot_gather_many([cdf, z], above)
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return z_b + t * (z_a - z_b)  # [BR, n_new], descending


def _refine_rounds(z, sdf, rays_o, rays_d, weights, cfg, rounds, n_new, base_inv_s, merge="bitonic"):
    """Shared refinement loop: [BR,128] padded buffers -> fully refined z.

    A ``fori_loop`` (not an unrolled python loop): all per-round shapes are
    the uniform [BR, 128] tile, so only the scalar ``valid_n`` / ``inv_s``
    vary — keeping one round body in the compiled kernel keeps Mosaic
    compile time sane.

    The LAST round runs outside the loop without an MLP sweep: its new
    samples' sdf values are only ever a merge payload that no one reads
    (the reference skips the last ``sdf_at`` too — get_visibility /
    up-sampling ``models/neus_hint_model.py:696-706``: the final
    ``merge_z_vals`` call carries no sdf).  The merge networks move
    (z, payload) pairs by z comparisons only, so the returned z is
    bit-identical to the round-4 kernels that swept anyway — this shaves
    one 16-column MLP sweep (~0.28 ms) per march."""
    br = z.shape[0]
    oo = jnp.sum(rays_o * rays_o, axis=-1, keepdims=True)  # [BR,1]
    od = jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    n_start = N_BUF - rounds * n_new  # 64 with defaults

    def merge_step(z, sdf, valid_n, new_z, new_sdf):
        lane = jax.lax.broadcasted_iota(jnp.int32, (br, N_BUF - n_new), 1)
        z_cat = jnp.concatenate(
            [jnp.where(lane < valid_n, z[:, : N_BUF - n_new], BIG_Z), new_z],
            axis=-1,
        )
        sdf_cat = jnp.concatenate([sdf[:, : N_BUF - n_new], new_sdf], axis=-1)
        if merge == "rank":
            return _rank_merge(z_cat, sdf_cat, n_new)
        return _bitonic_merge(z_cat, sdf_cat)

    def body(i, carry):
        z, sdf = carry
        valid_n = n_start + i * n_new
        inv_s = base_inv_s * jnp.exp2(i.astype(jnp.float32))
        new_z = _round_new_z(z, sdf, valid_n, inv_s, oo, od, n_new)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z[..., None]
        new_sdf = _mlp_sdf_3d(pts, weights, cfg)  # [BR, n_new]
        return merge_step(z, sdf, valid_n, new_z, new_sdf)

    z, sdf = jax.lax.fori_loop(0, rounds - 1, body, (z, sdf))
    valid_n = n_start + (rounds - 1) * n_new
    inv_s = base_inv_s * float(2 ** (rounds - 1))
    new_z = _round_new_z(z, sdf, valid_n, inv_s, oo, od, n_new)
    return merge_step(z, sdf, valid_n, new_z, jnp.zeros_like(new_z))


# ---------------------------------------------------------------------------
# Unrolled round-machinery kernels (rounds_impl="xla"): the per-round MLP
# sweeps leave the kernel and run as full-batch XLA matmuls (the ~55 TF/s
# chain rate vs ~30 in-kernel — PROFILE.md round-5); only the VPU machinery
# (inverse-CDF sampling + sorted merge) stays in Pallas.  Per round i the
# machinery kernel MERGES round i-1's samples and computes round i's new_z
# in one launch; a tail kernel does the final merge (zero payload — the
# last round's sdf values are never read, see ``_refine_rounds``).


def _merge_math(z, sdf, new_z, new_sdf, valid_n, n_new, merge):
    br = z.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, N_BUF - n_new), 1)
    z_cat = jnp.concatenate(
        [jnp.where(lane < valid_n, z[:, : N_BUF - n_new], BIG_Z), new_z], axis=-1
    )
    sdf_cat = jnp.concatenate([sdf[:, : N_BUF - n_new], new_sdf], axis=-1)
    if merge == "rank":
        return _rank_merge(z_cat, sdf_cat, n_new)
    return _bitonic_merge(z_cat, sdf_cat)


def _round_machinery_kernel(n_new, merge, merge_valid_n, next_valid_n, next_inv_s):
    """One unrolled machinery step.  ``merge_valid_n``/``next_valid_n`` are
    STATIC (python ints; None disables that half):

    * merge_valid_n is not None: inputs start (new_z_prev, new_sdf_prev)
      and the kernel merges them into (z, sdf) first;
    * next_valid_n is not None: the kernel emits new_z for round i
      (descending inverse-CDF samples at inv_s = ``next_inv_s``).
    """

    def kernel(z_ref, sdf_ref, o_ref, d_ref, *refs):
        refs = list(refs)
        z, sdf = z_ref[:], sdf_ref[:]
        if merge_valid_n is not None:
            newz_prev, newsdf_prev = refs.pop(0)[:], refs.pop(0)[:]
            z, sdf = _merge_math(
                z, sdf, newz_prev, newsdf_prev, merge_valid_n, n_new, merge
            )
        outs = refs
        if next_valid_n is not None:
            o, d = o_ref[:], d_ref[:]
            oo = jnp.sum(o * o, axis=-1, keepdims=True)
            od = jnp.sum(o * d, axis=-1, keepdims=True)
            new_z = _round_new_z(z, sdf, next_valid_n, next_inv_s, oo, od, n_new)
            outs.pop(0)[:] = new_z
        outs.pop(0)[:] = z
        if outs:  # the tail (merge-only) step drops the dead sdf buffer
            outs.pop(0)[:] = sdf

    return kernel


def _rounds_xla(
    weights, cfg, rays_o, rays_d, z0, sdf0,
    rounds, n_new, base_inv_s, merge, block_rays, interpret,
):
    """[B, n0] (z0, sdf0) -> [B, 128] refined z with XLA round sweeps."""
    (o_p, d_p, z0_p, sdf0_p), b, n_blocks = _pad_rays(
        [rays_o, rays_d, z0, sdf0], block_rays
    )
    br = block_rays
    n0 = z0.shape[1]
    total = n_blocks * br
    pad = jnp.full((total, N_BUF - n0), BIG_Z, jnp.float32)
    z = jnp.concatenate([z0_p, pad], axis=-1)
    sdf = jnp.concatenate([sdf0_p, jnp.zeros_like(pad)], axis=-1)

    def vspec(width):
        return pl.BlockSpec((br, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def launch(kernel, inputs, out_widths):
        outs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[vspec(a.shape[-1]) for a in inputs],
            out_specs=tuple(vspec(w) for w in out_widths),
            out_shape=tuple(
                jax.ShapeDtypeStruct((total, w), jnp.float32) for w in out_widths
            ),
            interpret=interpret,
        )(*inputs)
        return outs

    n_start = N_BUF - rounds * n_new
    new_z = new_sdf = None
    for i in range(rounds):
        valid_n = n_start + i * n_new
        inv_s = base_inv_s * float(2 ** i)
        if i == 0:
            kernel = _round_machinery_kernel(n_new, merge, None, valid_n, inv_s)
            new_z, z, sdf = launch(kernel, [z, sdf, o_p, d_p], (n_new, N_BUF, N_BUF))
        else:
            kernel = _round_machinery_kernel(
                n_new, merge, valid_n - n_new, valid_n, inv_s
            )
            new_z, z, sdf = launch(
                kernel, [z, sdf, o_p, d_p, new_z, new_sdf], (n_new, N_BUF, N_BUF)
            )
        if i + 1 < rounds:
            # The round's 16-column MLP sweep, as a full-batch XLA matmul
            # stream (the last round's sweep is skipped — payload-only).
            pts = o_p[:, None, :] + d_p[:, None, :] * new_z[..., None]
            new_sdf = _mlp_sdf_3d(pts, weights, cfg)
        else:
            new_sdf = jnp.zeros_like(new_z)
    tail = _round_machinery_kernel(
        n_new, merge, n_start + (rounds - 1) * n_new, None, None
    )
    (z_out,) = launch(tail, [z, sdf, o_p, d_p, new_z, new_sdf], (N_BUF,))
    return z_out[:b]


# ---------------------------------------------------------------------------
# Kernel bodies


def _importance_kernel(cfg, rounds, n_new, base_inv_s, n_weights, merge="bitonic"):
    def kernel(z0_ref, o_ref, d_ref, *refs):
        w_refs, (z_out_ref,) = refs[:n_weights], refs[n_weights:]
        weights = [r[:] for r in w_refs]
        o, d = o_ref[:], d_ref[:]
        z0 = z0_ref[:]
        br, n0 = z0.shape
        # Initial stratified-sample SDF sweep, fused into the kernel.
        pts0 = o[:, None, :] + d[:, None, :] * z0[..., None]
        sdf0 = _mlp_sdf_3d(pts0, weights, cfg)
        pad = jnp.full((br, N_BUF - n0), BIG_Z, jnp.float32)
        z = jnp.concatenate([z0, pad], axis=-1)
        sdf = jnp.concatenate([sdf0, jnp.zeros_like(pad)], axis=-1)
        z, _ = _refine_rounds(z, sdf, o, d, weights, cfg, rounds, n_new, base_inv_s, merge)
        z_out_ref[:] = z

    return kernel


def _sweep_kernel(cfg, n_weights):
    """Initial stratified SDF sweep alone (the split-march head): its
    [BR*n0, 256] activation stream is the only VMEM tenant, so it runs much
    larger ray blocks than the monolithic importance kernel."""

    def kernel(z0_ref, o_ref, d_ref, *refs):
        w_refs, (sdf_ref,) = refs[:n_weights], refs[n_weights:]
        weights = [r[:] for r in w_refs]
        o, d, z0 = o_ref[:], d_ref[:], z0_ref[:]
        pts0 = o[:, None, :] + d[:, None, :] * z0[..., None]
        sdf_ref[:] = _mlp_sdf_3d(pts0, weights, cfg)

    return kernel


def _rounds_kernel(cfg, rounds, n_new, base_inv_s, n_weights, merge):
    """Refinement rounds alone, reading (z0, sdf0) from the sweep kernel —
    its per-round 16-column MLP working set is small, so it too fits larger
    ray blocks than the monolith."""

    def kernel(z0_ref, sdf0_ref, o_ref, d_ref, *refs):
        w_refs, (z_out_ref,) = refs[:n_weights], refs[n_weights:]
        weights = [r[:] for r in w_refs]
        o, d = o_ref[:], d_ref[:]
        z0 = z0_ref[:]
        br, n0 = z0.shape
        pad = jnp.full((br, N_BUF - n0), BIG_Z, jnp.float32)
        z = jnp.concatenate([z0, pad], axis=-1)
        sdf = jnp.concatenate([sdf0_ref[:], jnp.zeros_like(pad)], axis=-1)
        z, _ = _refine_rounds(z, sdf, o, d, weights, cfg, rounds, n_new, base_inv_s, merge)
        z_out_ref[:] = z

    return kernel


def _shadow_final_math(z, o, d, sdist, inv_s, cos_anneal, weights, cfg, roll):
    """Shadow-march final sweep: refined z buffer -> tau [BR, 1].

    Pure-jnp math shared by the Pallas final-sweep kernel (``roll`` =
    pltpu.roll) and the XLA path (``roll`` = jnp.roll; see
    ``final_impl="xla"``): section mids/lengths, dual
    sdf+directional-derivative sweep, transmittance product — the tail of
    reference ``get_visibility`` (models/neus_hint_model.py:403-432)."""
    br = z.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, N_BUF), 1)
    dists = jnp.where(lane == N_BUF - 1, sdist, roll(z, -1) - z)
    mid = z + dists * 0.5

    pts = o[:, None, :] + d[:, None, :] * mid[..., None]  # [BR,128,3]
    # [BR, 1, 3] tangent broadcast implicitly inside the MLP
    # (explicit broadcast_to of a middle dim crashes Mosaic).
    dirs = d[:, None, :] + pts * 0.0
    sdf_f, dcos = _mlp_sdf_dirderiv_3d(pts, dirs, weights, cfg)
    iter_cos = -(
        jax.nn.relu(-dcos * 0.5 + 0.5) * (1.0 - cos_anneal)
        + jax.nn.relu(-dcos) * cos_anneal
    )
    est_next = sdf_f + iter_cos * dists * 0.5
    est_prev = sdf_f - iter_cos * dists * 0.5
    pcdf = jax.nn.sigmoid(est_prev * inv_s)
    ncdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip((pcdf - ncdf + 1e-5) / (pcdf + 1e-5), 0.0, 1.0)
    # tau = prod_{j < N-1} (1 - a_j + 1e-7): exclude the last sample.
    logs = jnp.where(lane < N_BUF - 1, jnp.log(1.0 - alpha + 1e-7), 0.0)
    return jnp.exp(jnp.sum(logs, axis=-1, keepdims=True))


def _shadow_final_kernel(cfg, n_weights):
    """Final-sweep half of the shadow march: refined z buffer -> tau.

    Identical math to the tail of ``_shadow_kernel`` (see
    ``_shadow_final_math``) — split out so the dual-stream MLP working set
    is the ONLY VMEM tenant, letting this kernel (and the refinement, via
    ``fused_importance_z``) run larger ray blocks than the monolithic
    kernel fits."""

    def kernel(z_ref, o_ref, d_ref, sdist_ref, invs_ref, anneal_ref, *refs):
        w_refs, (tau_ref,) = refs[:n_weights], refs[n_weights:]
        weights = [r[:] for r in w_refs]
        tau_ref[:] = _shadow_final_math(
            z_ref[:], o_ref[:], d_ref[:], sdist_ref[:],
            invs_ref[0, 0], anneal_ref[0, 0], weights, cfg,
            roll=lambda x, s: _roll(x, s, axis=1),
        )

    return kernel


def _shadow_kernel(cfg, rounds, n_new, base_inv_s, n_weights, merge="bitonic"):
    def kernel(z0_ref, o_ref, d_ref, sdist_ref, invs_ref, anneal_ref, *refs):
        w_refs, (tau_ref,) = refs[:n_weights], refs[n_weights:]
        weights = [r[:] for r in w_refs]
        inv_s = invs_ref[0, 0]
        cos_anneal = anneal_ref[0, 0]
        o = o_ref[:]
        d = d_ref[:]
        z0 = z0_ref[:]
        br, n0 = z0.shape
        pts0 = o[:, None, :] + d[:, None, :] * z0[..., None]
        sdf0 = _mlp_sdf_3d(pts0, weights, cfg)
        pad = jnp.full((br, N_BUF - n0), BIG_Z, jnp.float32)
        z = jnp.concatenate([z0, pad], axis=-1)
        sdf = jnp.concatenate([sdf0, jnp.zeros_like(pad)], axis=-1)
        z, _ = _refine_rounds(z, sdf, o, d, weights, cfg, rounds, n_new, base_inv_s, merge)

        # Final sweep: sdf + directional derivative over all 128 samples in
        # one 3-D activation (block_rays is sized so this fits VMEM); the
        # last interval gets the per-ray sample_dist (reference
        # get_visibility :416-418).
        tau_ref[:] = _shadow_final_math(
            z, o, d, sdist_ref[:], inv_s, cos_anneal, weights, cfg,
            roll=lambda x, s: _roll(x, s, axis=1),
        )

    return kernel


# ---------------------------------------------------------------------------
# Host-side wrappers


def _pad_rays(arrs, br):
    b = arrs[0].shape[0]
    n_blocks = -(-b // br)
    pad = n_blocks * br - b
    if pad:
        arrs = [jnp.concatenate([a, jnp.ones((pad, *a.shape[1:]), a.dtype)], 0) for a in arrs]
    return arrs, b, n_blocks


def _weights_and_specs(params, cfg: SDFNetConfig, mlp_dtype: str = "float32"):
    flat = materialize_sdf_weights(params, cfg)
    # Biases as [1, n] f32 rows (Mosaic prefers >=2D operands); 2-D weight
    # matrices cast to the MLP compute dtype (bf16 -> full-rate MXU).
    dt = jnp.dtype(mlp_dtype)
    weights = []
    for arr in flat:
        weights.append(arr[None, :] if arr.ndim == 1 else arr.astype(dt))
    specs = [
        pl.BlockSpec(
            w.shape,
            (lambda nd: (lambda i: (0,) * nd))(w.ndim),  # bind ndim now
            memory_space=pltpu.VMEM,
        )
        for w in weights
    ]
    return weights, specs


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "rounds", "n_new", "base_inv_s", "block_rays", "interpret",
        "mlp_dtype", "merge", "split", "sweep_block_rays", "sweep_impl",
        "rounds_impl",
    ),
)
def fused_importance_z(
    params: dict,
    cfg: SDFNetConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z0: jnp.ndarray,
    *,
    rounds: int = 4,
    n_new: int = 16,
    base_inv_s: float = 64.0,
    block_rays: int = 32,
    interpret: bool = False,
    mlp_dtype: str = "float32",
    merge: str = "bitonic",
    split: bool = False,
    sweep_block_rays: int = 128,
    sweep_impl: str = "pallas",
    rounds_impl: str = "pallas",
) -> jnp.ndarray:
    """[B, 64] stratified z -> [B, 128] refined z (sorted); the initial
    stratified SDF sweep runs inside the kernel.  ``merge`` selects the
    per-round sorted-merge network ("bitonic" | "rank").

    ``split=True`` runs the march as TWO kernels — the initial sweep
    (``sweep_block_rays``) and the refinement rounds (``block_rays``) —
    identical math; each half's VMEM working set stands alone so both fit
    larger ray blocks than the monolith (the same trick as the shadow
    split).  ``sweep_impl="xla"`` (split only) computes the initial sweep
    as plain XLA ops on the full batch instead of the Pallas sweep kernel
    — the SAME ``_mlp_sdf_3d`` jnp program, compiled by XLA into
    full-batch [B*64, F] matmuls.  ``rounds_impl="xla"`` (split only)
    additionally moves each refinement round's 16-column MLP sweep to XLA,
    leaving only the merge/inverse-CDF machinery in (unrolled) Pallas
    kernels — see ``_rounds_xla``."""
    if z0.shape[1] != N_BUF - rounds * n_new:
        raise ValueError(
            f"fused march needs z0 with {N_BUF - rounds * n_new} samples "
            f"(= {N_BUF} buffer - {rounds}x{n_new} refinement), got "
            f"{z0.shape[1]} — the validity masks assume this geometry"
        )
    if merge == "rank" and (n_new & (n_new - 1)) != 0:
        raise ValueError(
            f"merge='rank' needs a power-of-two n_new (its shift network's "
            f"stage sizes n_new, n_new/2, ..., 1 only realize every shift "
            f"count in [0, n_new] then), got {n_new} — use merge='bitonic'"
        )
    if not split and (sweep_impl == "xla" or rounds_impl == "xla"):
        raise ValueError("sweep_impl/rounds_impl='xla' require split=True")
    weights, w_specs = _weights_and_specs(params, cfg, mlp_dtype)

    if split:
        n0 = z0.shape[1]
        if sweep_impl == "xla":
            pts0 = rays_o[:, None, :] + rays_d[:, None, :] * z0[..., None]
            sweep = _mlp_sdf_3d(pts0, weights, cfg)
        else:
            (o_s, d_s, z0_s), b, n_blocks = _pad_rays(
                [rays_o, rays_d, z0], sweep_block_rays
            )
            sweep = pl.pallas_call(
                _sweep_kernel(cfg, len(weights)),
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((sweep_block_rays, n0), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((sweep_block_rays, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((sweep_block_rays, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    *w_specs,
                ],
                out_specs=pl.BlockSpec(
                    (sweep_block_rays, n0), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((n_blocks * sweep_block_rays, n0), jnp.float32),
                interpret=interpret,
            )(z0_s, o_s, d_s, *weights)[:b]

        if rounds_impl == "xla":
            return _rounds_xla(
                weights, cfg, rays_o, rays_d, z0, sweep,
                rounds, n_new, base_inv_s, merge, block_rays, interpret,
            )

        (rays_o, rays_d, z0, sweep), b, n_blocks = _pad_rays(
            [rays_o, rays_d, z0, sweep], block_rays
        )
        kernel = _rounds_kernel(cfg, rounds, n_new, base_inv_s, len(weights), merge)
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((block_rays, n0), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rays, n0), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rays, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rays, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                *w_specs,
            ],
            out_specs=pl.BlockSpec(
                (block_rays, N_BUF), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_blocks * block_rays, N_BUF), jnp.float32),
            interpret=interpret,
        )(z0, sweep, rays_o, rays_d, *weights)
        return out[:b]

    (rays_o, rays_d, z0), b, n_blocks = _pad_rays([rays_o, rays_d, z0], block_rays)
    n0 = z0.shape[1]

    kernel = _importance_kernel(cfg, rounds, n_new, base_inv_s, len(weights), merge)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rays, n0), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec(
            (block_rays, N_BUF), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_rays, N_BUF), jnp.float32),
        interpret=interpret,
    )(z0, rays_o, rays_d, *weights)
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "rounds", "n_new", "base_inv_s", "block_rays", "interpret",
        "mlp_dtype", "split", "refine_block_rays", "merge", "sweep_impl",
        "final_impl", "rounds_impl",
    ),
)
def fused_shadow_tau(
    params: dict,
    cfg: SDFNetConfig,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    z0: jnp.ndarray,
    sample_dist: jnp.ndarray,
    inv_s: jnp.ndarray,
    cos_anneal_ratio: jnp.ndarray,
    *,
    rounds: int = 4,
    n_new: int = 16,
    base_inv_s: float = 64.0,
    block_rays: int = 16,
    interpret: bool = False,
    mlp_dtype: str = "float32",
    split: bool = False,
    refine_block_rays: int = 64,
    merge: str = "bitonic",
    sweep_impl: str = "pallas",
    final_impl: str = "pallas",
    rounds_impl: str = "pallas",
) -> jnp.ndarray:
    """Shadow rays -> final transmittance [B, 1] (initial sweep in-kernel).

    ``split=True`` runs the march as refinement kernel + final-sweep kernel
    (identical math; each half fits larger ``block_rays`` than the monolith
    — see _shadow_final_kernel).  ``block_rays`` then sizes the final sweep
    and ``refine_block_rays`` the refinement.  ``sweep_impl="xla"`` moves
    the refinement's initial sweep to XLA (see ``fused_importance_z``);
    ``final_impl="xla"`` computes the final dual sdf+dirderiv sweep as
    plain XLA ops on the full batch (same ``_shadow_final_math`` program).
    Both require ``split=True``."""
    if z0.shape[1] != N_BUF - rounds * n_new:
        raise ValueError(
            f"fused march needs z0 with {N_BUF - rounds * n_new} samples "
            f"(= {N_BUF} buffer - {rounds}x{n_new} refinement), got "
            f"{z0.shape[1]} — the validity masks assume this geometry"
        )
    if not split and "xla" in (sweep_impl, final_impl, rounds_impl):
        raise ValueError("sweep/final/rounds_impl='xla' require split=True")
    (ray_o, ray_d, z0, sample_dist), b, n_blocks = _pad_rays(
        [ray_o, ray_d, z0, sample_dist], block_rays
    )
    weights, w_specs = _weights_and_specs(params, cfg, mlp_dtype)
    n0 = z0.shape[1]
    inv_s_arr = jnp.asarray(inv_s, jnp.float32).reshape(1, 1)
    anneal_arr = jnp.asarray(cos_anneal_ratio, jnp.float32).reshape(1, 1)

    if split:
        # Two-kernel pipeline: refinement rides fused_importance_z (its
        # refinement machinery is byte-identical — same rounds/n_new/
        # base_inv_s schedule, reference get_visibility:373-432 reuses
        # up_sample), the final dual-stream sweep gets its own kernel.
        # Each half's VMEM working set is alone, so both fit larger ray
        # blocks than the monolith; the interposed [B,128] z buffer is a
        # 256 KB HBM round trip at batch 512 — noise.
        z = fused_importance_z(
            params, cfg, ray_o[:b], ray_d[:b], z0[:b],
            rounds=rounds, n_new=n_new, base_inv_s=base_inv_s,
            block_rays=refine_block_rays, interpret=interpret,
            mlp_dtype=mlp_dtype, merge=merge,
            split=(sweep_impl == "xla" or rounds_impl == "xla"),
            sweep_impl=sweep_impl, rounds_impl=rounds_impl,
        )
        if final_impl == "xla":
            return _shadow_final_math(
                z, ray_o[:b], ray_d[:b], sample_dist[:b],
                jnp.asarray(inv_s, jnp.float32),
                jnp.asarray(cos_anneal_ratio, jnp.float32),
                weights, cfg, roll=lambda x, s: jnp.roll(x, s, axis=1),
            )
        (ray_o, ray_d, z, sample_dist), b, n_blocks = _pad_rays(
            [ray_o[:b], ray_d[:b], z, sample_dist[:b]], block_rays
        )
        kernel = _shadow_final_kernel(cfg, len(weights))
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((block_rays, N_BUF), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rays, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rays, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rays, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                *w_specs,
            ],
            out_specs=pl.BlockSpec(
                (block_rays, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_blocks * block_rays, 1), jnp.float32),
            interpret=interpret,
        )(z, ray_o, ray_d, sample_dist, inv_s_arr, anneal_arr, *weights)
        return out[:b]

    kernel = _shadow_kernel(cfg, rounds, n_new, base_inv_s, len(weights), merge)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rays, n0), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec(
            (block_rays, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_rays, 1), jnp.float32),
        interpret=interpret,
    )(z0, ray_o, ray_d, sample_dist, inv_s_arr, anneal_arr, *weights)
    return out[:b]
