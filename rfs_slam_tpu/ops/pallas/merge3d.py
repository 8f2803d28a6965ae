"""Pallas TPU kernel: Gaussian-mixture merge for 3-D landmark maps.

The Victoria Park RB-PHD configuration carries Landmark3d mixtures
(x, y, tree-diameter) at map capacity 512, where the XLA merge fixpoint
materializes [P, M, M] gate cubes (~1 GiB of HBM traffic per pass at
P=100, M=512).  This is the D=3 counterpart of merge2d (same pass
structure, safe-absorber rule, absorber-axis tiering — see merge2d.py),
with the 3x3 symmetric inverse scalarized via the adjugate.

Packed-symmetric cov plane order (core/planar.tri_index, D=3):
0=xx, 1=xy, 2=xd, 3=yy, 4=yd, 5=dd.

Reference semantics: GaussianMixture.hpp:394-475 (pairwise Mahalanobis
gate, moment-matched merge with covariance inflation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rfs_slam_tpu.core.state import GMState

_NM = 3   # mean planes
_NC = 6   # packed cov planes


def _inv_sym3(c):
    """Packed 3x3 symmetric inverse via adjugate; returns packed planes."""
    a, b, cc, d, e, f = c
    cof00 = d * f - e * e
    cof01 = cc * e - b * f
    cof02 = b * e - cc * d
    cof11 = a * f - cc * cc
    cof12 = cc * b - a * e
    cof22 = a * d - b * b
    det = a * cof00 + b * cof01 + cc * cof02
    return [cof00 / det, cof01 / det, cof02 / det,
            cof11 / det, cof12 / det, cof22 / det]


def _quad3(inv, dx, dy, dd):
    """x^T M^-1 x with packed inverse planes (broadcast-compatible)."""
    i00, i01, i02, i11, i12, i22 = inv
    return (i00 * dx * dx + i11 * dy * dy + i22 * dd * dd
            + 2.0 * (i01 * dx * dy + i02 * dx * dd + i12 * dy * dd))


def _merge_kernel(fixed_passes, ak, t2_ref, infl_ref, max_pass_ref, *refs):
    in_refs = refs[:_NM + _NC + 2 + 1]
    out_refs = refs[_NM + _NC + 2 + 1:]
    mean_refs = in_refs[:_NM]
    cov_refs = in_refs[_NM:_NM + _NC]
    w_ref, wp_ref, alive_ref = in_refs[_NM + _NC:]
    B, N = w_ref.shape
    AK = N if ak is None else ak
    t2 = t2_ref[0]
    infl = infl_ref[0]
    max_passes = max_pass_ref[0]

    row_i = jax.lax.broadcasted_iota(jnp.int32, (AK, N), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (AK, N), 1)
    upper = row_i < col_j

    def sl(a):
        # see merge2d: fused slice+newaxis lowers through a gather Mosaic
        # rejects; slice_in_dim then minor-dim insert lowers cleanly
        return a if AK == N else jax.lax.slice_in_dim(a, 0, AK, axis=1)

    def pad_i(vals, fill):
        if AK == N:
            return vals
        tail = jnp.full((B, N - AK), fill, vals.dtype)
        return jax.lax.concatenate([vals, tail], 1)

    def one_pass(state):
        means, covs, w, wp, alive, _, it = state
        inv = _inv_sym3(covs)                              # [B, N] x 6
        diffs = [m[:, None, :] - sl(m)[:, :, None] for m in means]
        inv_i = [sl(p)[:, :, None] for p in inv]
        inv_j = [p[:, None, :] for p in inv]
        d2_ij = _quad3(inv_i, *diffs)                      # [B, i<AK, j]
        d2_ji = _quad3(inv_j, *diffs)
        both = (sl(alive)[:, :, None] > 0) & (alive[:, None, :] > 0)
        gate = both & upper[None] & ((d2_ij <= t2) | (d2_ji <= t2))

        # safe-absorber rule (ops/gm.py:_merge_pass): mass conservation in
        # broken chains
        first_any = jnp.min(jnp.where(gate, row_i[None], N), axis=1)
        safe_gate = gate & (sl(first_any)[:, :, None] == N)
        first_i = jnp.min(jnp.where(safe_gate, row_i[None], N), axis=1)
        claimed = safe_gate & (row_i[None] == first_i[:, None, :])
        j_star = jnp.min(jnp.where(claimed, col_j[None], N), axis=2)
        sel = (claimed & (col_j[None] == j_star[:, :, None])).astype(
            jnp.float32)

        fields = jnp.stack(list(means) + list(covs) + [w], axis=-1)
        gathered = jax.lax.dot_general(
            sel, fields, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [B, AK, 10]
        mj = [pad_i(gathered[..., k], 0.0) for k in range(_NM)]
        cj = [pad_i(gathered[..., _NM + k], 0.0) for k in range(_NC)]
        wj = pad_i(gathered[..., _NM + _NC], 0.0)
        j_star_f = pad_i(j_star, N)

        wm = w + wj
        has = (j_star_f < N) & (wm != 0.0)
        wm_s = jnp.where(has, wm, 1.0)
        xm = [(means[k] * w + mj[k] * wj) / wm_s for k in range(_NM)]
        d1 = [xm[k] - means[k] for k in range(_NM)]
        d2v = [xm[k] - mj[k] for k in range(_NM)]
        qm = []
        for i in range(_NM):
            for j in range(i, _NM):
                k = _tri(i, j)
                qm.append((w * (covs[k] + infl * d1[i] * d1[j])
                           + wj * (cj[k] + infl * d2v[i] * d2v[j])) / wm_s)

        means = tuple(jnp.where(has, xm[k], means[k]) for k in range(_NM))
        covs = tuple(jnp.where(has, qm[k], covs[k]) for k in range(_NC))
        w = jnp.where(has, wm, w)
        wp = jnp.where(has, 0.0, wp)
        dead = jnp.sum(sel, axis=1) > 0.0
        alive = jnp.where(dead, 0, alive)
        n_merged = jnp.sum(has.astype(jnp.int32))
        return means, covs, w, wp, alive, n_merged, it + 1

    def cond(state):
        n_merged, it = state[-2], state[-1]
        return (n_merged > 0) & (it < max_passes)

    init = (tuple(r[...] for r in mean_refs),
            tuple(r[...] for r in cov_refs),
            w_ref[...], wp_ref[...], alive_ref[...],
            jnp.int32(1), jnp.int32(0))
    if fixed_passes is not None:
        # experiment knob; measured reject as default (see merge2d)
        out = jax.lax.fori_loop(0, fixed_passes,
                                lambda _, st: one_pass(st), init)
    else:
        out = jax.lax.while_loop(cond, one_pass, init)
    means, covs, w, wp, alive, _, _ = out
    for k in range(_NM):
        out_refs[k][...] = means[k]
    for k in range(_NC):
        out_refs[_NM + k][...] = covs[k]
    out_refs[_NM + _NC][...] = w
    out_refs[_NM + _NC + 1][...] = wp
    out_refs[_NM + _NC + 2][...] = alive


def _tri(i, j):
    # packed upper-triangular index for D=3 (core/planar.tri_index)
    return {(0, 0): 0, (0, 1): 1, (0, 2): 2,
            (1, 1): 3, (1, 2): 4, (2, 2): 5}[(i, j)]


@functools.partial(jax.jit, static_argnames=("max_passes", "block",
                                             "interpret", "ak",
                                             "fixed_passes"))
def merge3d(gm: GMState, threshold, f_inflation, max_passes: int = 8,
            block: int = 8, interpret: bool = False,
            ak: int | None = None,
            fixed_passes: int | None = None) -> GMState:
    """Pallas merge for D=3 mixtures; semantics match ops/gm.py merge.

    ``ak``: absorber-axis tier — requires every alive slot index < ak
    (callers compact alive-first; see gm.merge).  The particle ``block``
    must be a multiple of 8 (Mosaic block-shape constraint), so at large
    capacities the caller limits ``ak`` to keep the [block, AK, N] pass
    cubes inside VMEM (gm.merge falls back to XLA beyond).
    """
    D = gm.dim
    P, N = gm.w.shape
    assert D == 3, "merge3d requires 3-D landmarks"
    pad_p = (-P) % block

    def pad(a):
        return jnp.pad(a, ((0, pad_p),) + ((0, 0),) * (a.ndim - 1))

    means = [pad(gm.mean[k]) for k in range(_NM)]
    covs = [pad(gm.cov[k]) for k in range(_NC)]
    w = pad(gm.w)
    wp = pad(gm.w_prev)
    alive = pad(gm.alive.astype(jnp.int32))
    Pp = P + pad_p

    t2 = jnp.asarray([threshold * threshold], jnp.float32)
    infl = jnp.asarray([f_inflation], jnp.float32)
    mp = jnp.asarray([max_passes], jnp.int32)

    grid = (Pp // block,)
    bspec = pl.BlockSpec((block, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_arr = _NM + _NC + 2
    outs = pl.pallas_call(
        functools.partial(_merge_kernel, fixed_passes, ak),
        grid=grid,
        in_specs=[sspec, sspec, sspec] + [bspec] * (n_arr + 1),
        out_specs=tuple([bspec] * (n_arr + 1)),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((Pp, N), jnp.float32)] * n_arr
            + [jax.ShapeDtypeStruct((Pp, N), jnp.int32)]
        ),
        interpret=interpret,
    )(t2, infl, mp, *means, *covs, w, wp, alive)
    means = [o[:P] for o in outs[:_NM]]
    covs = [o[:P] for o in outs[_NM:_NM + _NC]]
    w, wp, alive = (o[:P] for o in outs[_NM + _NC:])
    return GMState(mean=jnp.stack(means, axis=0), cov=jnp.stack(covs, axis=0),
                   w=w, w_prev=wp, alive=alive > 0)
