"""Pallas TPU kernel: Gaussian-mixture merge for 2-D landmark maps.

The reference's merge is an O(M^2) greedy pairwise scan per particle
(reference: GaussianMixture.hpp:394-475) and is the hottest phase of the
RB-PHD update after batching (the XLA while_loop version costs ~6 ms/step at
the benchmark scale).  This kernel runs the whole fixed-point merge loop
on-chip: a block of particles' mixtures lives in VMEM as component arrays
([B, N] lanes-major), each pass builds the [B, N, N] Mahalanobis gate with
the VPU, resolves a maximal disjoint pair set (lowest-index-first, identical
to ops/gm.py's parallel-pass semantics), gathers merge partners with one
selection-matrix matmul on the MXU, and iterates until no pair merges — all
without touching HBM between passes.

Layout: component arrays mx/my/p00/p01/p11/w/w_prev [P, N] float32 and
alive [P, N] int32 (bool is not a TPU-friendly storage type), N a multiple
of 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rfs_slam_tpu.core.state import GMState


def _merge_kernel(fixed_passes, ak, t2_ref, infl_ref, max_pass_ref,
                  mx_ref, my_ref, p00_ref, p01_ref, p11_ref,
                  w_ref, wp_ref, alive_ref,
                  omx_ref, omy_ref, op00_ref, op01_ref, op11_ref,
                  ow_ref, owp_ref, oalive_ref):
    B, N = mx_ref.shape
    AK = N if ak is None else ak
    t2 = t2_ref[0]
    infl = infl_ref[0]
    max_passes = max_pass_ref[0]

    # Absorber-axis restriction: callers guarantee every ALIVE slot index is
    # < AK (merge() compacts alive-first and picks the tier from the max
    # alive count), so restricting the pair-search cube to [B, AK, N] is
    # BIT-EXACT vs the full [B, N, N] kernel — rows i >= AK are dead and can
    # neither absorb nor be a gated partner — while the per-pass cube work
    # scales down by AK/N.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (AK, N), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (AK, N), 1)
    upper = row_i < col_j

    def pad_i(vals, fill):
        """[B, AK] per-absorber values -> [B, N] (tail = fill, no update)."""
        if AK == N:
            return vals
        tail = jnp.full((B, N - AK), fill, vals.dtype)
        return jax.lax.concatenate([vals, tail], 1)

    def sl(a):
        """Leading-AK slice of a [B, N] array — via lax.slice_in_dim: the
        combined ``a[:, :AK, None]`` form lowers through jnp's gather path,
        which Mosaic rejects inside while bodies; slice-then-insert works."""
        return a if AK == N else jax.lax.slice_in_dim(a, 0, AK, axis=1)

    def one_pass(state):
        mx, my, p00, p01, p11, w, wp, alive, _, it = state
        det = p00 * p11 - p01 * p01                       # [B, N]
        i00 = p11 / det
        i01 = -p01 / det
        i11 = p00 / det
        dx = mx[:, None, :] - sl(mx)[:, :, None]          # [B, i<AK, j]
        dy = my[:, None, :] - sl(my)[:, :, None]
        d2_ij = (sl(i00)[:, :, None] * dx * dx
                 + 2.0 * sl(i01)[:, :, None] * dx * dy
                 + sl(i11)[:, :, None] * dy * dy)
        d2_ji = (i00[:, None, :] * dx * dx
                 + 2.0 * i01[:, None, :] * dx * dy
                 + i11[:, None, :] * dy * dy)
        both = (sl(alive)[:, :, None] > 0) & (alive[:, None, :] > 0)
        gate = both & upper[None] & ((d2_ij <= t2) | (d2_ji <= t2))

        # safe-absorber rule (see ops/gm.py:_merge_pass): a component with a
        # smaller gated partner must not absorb this pass, else a broken
        # chain loses the absorbed component's mass
        first_any = jnp.min(jnp.where(gate, row_i[None], N), axis=1)  # [B,j]
        # broadcast in i32 and compare after the minor-dim insertion —
        # Mosaic only supports inserting a minor dim on 32-bit types
        safe_gate = gate & (sl(first_any)[:, :, None] == N)
        first_i = jnp.min(jnp.where(safe_gate, row_i[None], N), axis=1)
        claimed = safe_gate & (row_i[None] == first_i[:, None, :])
        j_star = jnp.min(jnp.where(claimed, col_j[None], N), axis=2)  # [B,i<AK]
        sel = (claimed & (col_j[None] == j_star[:, :, None])).astype(jnp.float32)

        fields = jnp.stack([mx, my, p00, p01, p11, w], axis=-1)       # [B,N,6]
        gathered = jax.lax.dot_general(
            sel, fields, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                             # [B,AK,6]
        mxj = pad_i(gathered[..., 0], 0.0)
        myj = pad_i(gathered[..., 1], 0.0)
        p00j = pad_i(gathered[..., 2], 0.0)
        p01j = pad_i(gathered[..., 3], 0.0)
        p11j = pad_i(gathered[..., 4], 0.0)
        wj = pad_i(gathered[..., 5], 0.0)
        j_star_f = pad_i(j_star, N)                       # tail: no pair

        wm = w + wj
        has = (j_star_f < N) & (wm != 0.0)
        wm_s = jnp.where(has, wm, 1.0)
        xm = (mx * w + mxj * wj) / wm_s
        ym = (my * w + myj * wj) / wm_s
        d1x, d1y = xm - mx, ym - my
        d2x, d2y = xm - mxj, ym - myj
        q00 = (w * (p00 + infl * d1x * d1x) + wj * (p00j + infl * d2x * d2x)) / wm_s
        q01 = (w * (p01 + infl * d1x * d1y) + wj * (p01j + infl * d2x * d2y)) / wm_s
        q11 = (w * (p11 + infl * d1y * d1y) + wj * (p11j + infl * d2y * d2y)) / wm_s

        mx = jnp.where(has, xm, mx)
        my = jnp.where(has, ym, my)
        p00 = jnp.where(has, q00, p00)
        p01 = jnp.where(has, q01, p01)
        p11 = jnp.where(has, q11, p11)
        w = jnp.where(has, wm, w)
        wp = jnp.where(has, 0.0, wp)
        dead = jnp.sum(sel, axis=1) > 0.0                 # [B, j]
        alive = jnp.where(dead, 0, alive)
        n_merged = jnp.sum(has.astype(jnp.int32))
        return mx, my, p00, p01, p11, w, wp, alive, n_merged, it + 1

    def cond(state):
        n_merged, it = state[-2], state[-1]
        return (n_merged > 0) & (it < max_passes)

    init = (mx_ref[...], my_ref[...], p00_ref[...], p01_ref[...],
            p11_ref[...], w_ref[...], wp_ref[...], alive_ref[...],
            jnp.int32(1), jnp.int32(0))
    if fixed_passes is not None:
        # fixed pass count (experiment knob; MEASURED REJECT as default —
        # bench r4: slower AND less accurate than the fixpoint loop, see
        # RBPHDConfig.merge_passes)
        out = jax.lax.fori_loop(0, fixed_passes,
                                lambda _, st: one_pass(st), init)
    else:
        out = jax.lax.while_loop(cond, one_pass, init)
    mx, my, p00, p01, p11, w, wp, alive = out[:8]
    omx_ref[...] = mx
    omy_ref[...] = my
    op00_ref[...] = p00
    op01_ref[...] = p01
    op11_ref[...] = p11
    ow_ref[...] = w
    owp_ref[...] = wp
    oalive_ref[...] = alive


@functools.partial(jax.jit, static_argnames=("max_passes", "block",
                                             "interpret", "fixed_passes",
                                             "ak"))
def merge2d(gm: GMState, threshold, f_inflation, max_passes: int = 8,
            block: int = 8, interpret: bool = False,
            fixed_passes: int | None = None,
            ak: int | None = None) -> GMState:
    """Pallas merge for D=2 mixtures; semantics match ops/gm.py merge.

    ``ak``: static absorber-axis tier — REQUIRES every alive slot index to
    be < ak (callers compact alive-first and pick the tier from the max
    alive count; see gm.merge).  Bit-exact vs the full kernel under that
    invariant, with per-pass cube work scaled by ak/capacity.
    """
    D = gm.dim
    P, N = gm.w.shape
    assert D == 2, "merge2d requires 2-D landmarks"
    pad_p = (-P) % block
    def pad(a):
        return jnp.pad(a, ((0, pad_p),) + ((0, 0),) * (a.ndim - 1))

    mx = pad(gm.mean[0])
    my = pad(gm.mean[1])
    p00 = pad(gm.cov[0])
    p01 = pad(gm.cov[1])
    p11 = pad(gm.cov[2])
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
    outs = pl.pallas_call(
        functools.partial(_merge_kernel, fixed_passes, ak),
        grid=grid,
        in_specs=[sspec, sspec, sspec] + [bspec] * 8,
        out_specs=tuple([bspec] * 8),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((Pp, N), jnp.float32)] * 7
            + [jax.ShapeDtypeStruct((Pp, N), jnp.int32)]
        ),
        interpret=interpret,
    )(t2, infl, mp, mx, my, p00, p01, p11, w, wp, alive)
    mx, my, p00, p01, p11, w, wp, alive = [o[:P] for o in outs]
    mean = jnp.stack([mx, my], axis=0)
    cov = jnp.stack([p00, p01, p11], axis=0)
    return GMState(mean=mean, cov=cov, w=w, w_prev=wp, alive=alive > 0)
