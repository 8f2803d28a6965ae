"""Pallas TPU kernel: fused RB-PHD map update for 2-D range-bearing SLAM.

The RB-PHD map-update phase (reference hot loop: KalmanFilter.hpp:261-342
driven by RBPHDFilter.hpp:597-725) is, in the XLA path
(``filters/rbphd.py:_map_update``), a chain of O(50) small fusions whose
intermediates — the ``[P, Z, M]`` likelihood / Mahalanobis / validity cubes
and the weight table — round-trip through HBM between fusions.  PERF.md's
roofline shows the step running 10-25x above its memory bound with launch
count and HBM round-trips as the binding constraints, and names this kernel
as the fix.

This kernel keeps one particle-block's planes resident in VMEM through the
ENTIRE phase:

    Pd (annulus + close-to-limit buffer)
    -> EKF multi-correct (S, S^-1, K, (I-KH)C, per-(z,m) innovation,
       Mahalanobis distance, Gaussian likelihood, gates)
    -> nM x nZ weight table + column normalization (clutter in denominator)
    -> missed-detection weights with near-limit compensation
    -> unused-measurement flags
    -> hierarchical new-Gaussian candidate selection (per-measurement
       iterated-max top-``new_per_z``)

and emits only plane-sized results: no [P, Z, M] cube ever touches HBM.
The final exact top-k over the Zc * new_per_z survivors, the new-mean
reconstruction (``m + K nu`` at the <= k selected cells), and
``replace_weakest`` stay in XLA — they are plane-sized and XLA fuses them
well.

Semantics are exactly those of the XLA path for the ``RangeBearing`` model
(models/measurement.py:65-164) and ``InnovationGates.range_bearing``; the
filter auto-selects the kernel on TPU for D=2 range-bearing configurations
with lane-aligned map capacity and falls back to the XLA path elsewhere
(Victoria Park's scan-dependent Pd model keeps the XLA path).

Layout: component planes [P, M] float32 (lanes = landmarks), alive as int32.
Cubes are [B, Zc, M] in VMEM only (B = particle block).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rfs_slam_tpu.core import gaussian

def _atan_01(q):
    """atan on [0, 1], Cephes atanf scheme (~1 ulp f32).

    Direct odd polynomial below tan(pi/8); above it the half-angle identity
    atan(q) = pi/4 + atan((q-1)/(q+1)) maps the argument back into range.
    """
    use2 = q > 0.4142135623730951
    x = jnp.where(use2, (q - 1.0) / (q + 1.0), q)
    z = x * x
    p = ((((8.05374449538e-2 * z - 1.38776856032e-1) * z
           + 1.99777106478e-1) * z - 3.33329491539e-1) * z * x + x)
    return jnp.where(use2, 0.7853981633974483 + p, p)


def _atan2(y, x):
    """atan2 built from a polynomial atan — Mosaic TPU lowers neither atan2
    nor atan.

    Octant reduction keeps the atan argument in [0, 1] (best f32 accuracy);
    quadrant fixup reproduces jnp.arctan2 up to the sign of atan2(-0, x<0),
    which the caller's angle-wrap makes irrelevant (+pi == -pi).
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    q = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    r = _atan_01(q)
    r = jnp.where(ay > ax, 0.5 * jnp.pi - r, r)
    r = jnp.where(x < 0.0, jnp.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


# params vector layout (SMEM)
_N_PARAMS = 12
(_R_MAX, _R_MIN, _R_BUF, _PD_CONST, _CLUTTER, _R00, _R01, _R11,
 _MD_T2, _BIRTH_W, _T_R, _T_B) = range(_N_PARAMS)


def _kernel(new_per_z, params_ref, pose_ref, mx_ref, my_ref,
            c00_ref, c01_ref, c11_ref, w_ref, wp_ref, alive_ref,
            zr_ref, zb_ref, zm_ref,
            w_out, wp_out, pd_out, colsum_out, unused_out,
            cw_out, cm_out,
            k00_out, k01_out, k10_out, k11_out,
            cu00_out, cu01_out, cu11_out, zer_out, zeb_out):
    B, M = mx_ref.shape
    Zc = zr_ref.shape[1]
    r_max = params_ref[_R_MAX]
    r_min = params_ref[_R_MIN]
    r_buf = params_ref[_R_BUF]
    pd_const = params_ref[_PD_CONST]
    clutter = params_ref[_CLUTTER]
    R00 = params_ref[_R00]
    R01 = params_ref[_R01]
    R11 = params_ref[_R11]
    md_t2 = params_ref[_MD_T2]
    birth_w = params_ref[_BIRTH_W]
    t_r = params_ref[_T_R]
    t_b = params_ref[_T_B]

    px = pose_ref[:, 0:1]
    py = pose_ref[:, 1:2]
    pth = pose_ref[:, 2:3]
    mx = mx_ref[...]
    my = my_ref[...]
    c00 = c00_ref[...]
    c01 = c01_ref[...]
    c11 = c11_ref[...]
    w = w_ref[...]
    alive = alive_ref[...] > 0

    # ---- expected measurement + Jacobian (RangeBearing.measure_p)
    dx = mx - px
    dy = my - py
    r2 = dx * dx + dy * dy
    r = jnp.sqrt(r2)
    b = gaussian.wrap_angle(_atan2(dy, dx) - pth)
    r2s = jnp.maximum(r2, gaussian.R2_TINY)
    rs = jnp.sqrt(r2s)
    h00 = dx / rs
    h01 = dy / rs
    h10 = -dy / r2s
    h11 = dx / r2s

    # ---- S = H C H^T + R (planar.sandwich_sym ordering)
    hs00 = h00 * c00 + h01 * c01
    hs01 = h00 * c01 + h01 * c11
    hs10 = h10 * c00 + h11 * c01
    hs11 = h10 * c01 + h11 * c11
    s00 = hs00 * h00 + hs01 * h01 + R00
    s01 = hs00 * h10 + hs01 * h11 + R01
    s11 = hs10 * h10 + hs11 * h11 + R11
    det = s00 * s11 - s01 * s01
    i00 = s11 / det
    i01 = -s01 / det
    i11 = s00 / det

    # ---- K = C H^T S^-1, NaN-guarded (ops/ekf.correct_all)
    cht00 = c00 * h00 + c01 * h01
    cht01 = c00 * h10 + c01 * h11
    cht10 = c01 * h00 + c11 * h01
    cht11 = c01 * h10 + c11 * h11
    k00 = cht00 * i00 + cht01 * i01
    k01 = cht00 * i01 + cht01 * i11
    k10 = cht10 * i00 + cht11 * i01
    k11 = cht10 * i01 + cht11 * i11
    k00 = jnp.where(jnp.isfinite(k00), k00, 0.0)
    k01 = jnp.where(jnp.isfinite(k01), k01, 0.0)
    k10 = jnp.where(jnp.isfinite(k10), k10, 0.0)
    k11 = jnp.where(jnp.isfinite(k11), k11, 0.0)

    # ---- cov_upd = (I - K H) C, symmetrized (KalmanFilter.hpp:240-245)
    kh00 = k00 * h00 + k01 * h10
    kh01 = k00 * h01 + k01 * h11
    kh10 = k10 * h00 + k11 * h10
    kh11 = k10 * h01 + k11 * h11
    a00 = 1.0 - kh00
    a01 = -kh01
    a10 = -kh10
    a11 = 1.0 - kh11
    u00 = a00 * c00 + a01 * c01
    u01 = a00 * c01 + a01 * c11
    u10 = a10 * c00 + a11 * c01
    u11 = a10 * c01 + a11 * c11

    # ---- Pd + close-to-limit (RangeBearing.pd_p, RBPHDFilter.hpp:597-609)
    mvalid = (r <= r_max) & (r >= r_min)
    pd_raw = jnp.where(mvalid & alive, pd_const, 0.0)
    near_inner = mvalid & ((r >= r_max - r_buf) | (r <= r_min + r_buf))
    near_outer = (~mvalid) & ((r <= r_max + r_buf) & (r >= r_min - r_buf))
    close = (near_inner | near_outer) & alive
    pd = jnp.where(close, 1.0, pd_raw)

    # ---- [B, Zc, M] cubes, VMEM-resident only
    zr = zr_ref[0, :]
    zb = zb_ref[0, :]
    # broadcast the mask in f32 and compare after: Mosaic only supports
    # minor-dim insertion (the trailing None) for 32-bit element types
    zm_f = zm_ref[0, :].astype(jnp.float32)
    zm_cube = zm_f[None, :, None] > 0.5                      # [1, Zc, 1]
    ir = zr[None, :, None] - r[:, None, :]
    ib = gaussian.wrap_angle(zb[None, :, None] - b[:, None, :])
    # no select on i1 vectors (Mosaic): express the disabled-gate branch as
    # a disjunction instead of a where
    gate_ok = (((t_r <= 0.0) | (jnp.abs(ir) <= t_r))
               & ((t_b <= 0.0) | (jnp.abs(ib) <= t_b)))
    md2 = (i00[:, None, :] * ir * ir + 2.0 * i01[:, None, :] * ir * ib
           + i11[:, None, :] * ib * ib)
    norm = jnp.sqrt((2.0 * jnp.pi) ** 2 * det)
    lik = jnp.exp(-0.5 * md2) / norm[:, None, :]
    lik = jnp.where(jnp.isfinite(lik), lik, 0.0)
    lik = jnp.where(gate_ok & mvalid[:, None, :], lik, 0.0)

    # ---- weight table + column normalization (RBPHDFilter.hpp:620-659)
    cell = (alive[:, None, :] & (pd[:, None, :] > 0.0)
            & zm_cube & (md2 <= md_t2) & (lik > 0.0))
    w_tab = jnp.where(cell, pd[:, None, :] * w[:, None, :] * lik, 0.0)
    col_sum = clutter + jnp.sum(w_tab, axis=2)               # [B, Zc]
    w_tab = jnp.where(zm_cube, w_tab / col_sum[:, :, None], 0.0)

    # ---- missed-detection weights (RBPHDFilter.hpp:686-706)
    row_sum = jnp.sum(w_tab, axis=1)                         # [B, M]
    w_miss = (1.0 - pd) * w
    delta = pd * w - row_sum
    comp = close & (w > birth_w) & (delta > 0.0)
    w_miss = jnp.where(comp, jnp.minimum(w_miss + delta, 1.0), w_miss)

    # ---- unused measurements (RBPHDFilter.hpp:709-720)
    used = jnp.sum(jnp.where(w_tab > 0.0, 1.0, 0.0), axis=2) > 0.0
    unused = (zm_f[None, :] > 0.5) & ~used

    # ---- hierarchical per-measurement top-new_per_z (iterated first-max)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Zc, M), 2)
    v = w_tab
    for t in range(new_per_z):
        vmax = jnp.max(v, axis=2)                            # [B, Zc]
        at_max = v == vmax[:, :, None]
        idx = jnp.min(jnp.where(at_max, lane, M), axis=2)    # first argmax
        idx = jnp.minimum(idx, M - 1).astype(jnp.int32)
        cw_out[:, t * Zc:(t + 1) * Zc] = vmax
        cm_out[:, t * Zc:(t + 1) * Zc] = idx
        v = jnp.where(lane == idx[:, :, None], 0.0, v)

    w_out[...] = jnp.where(alive, w_miss, w)
    wp_out[...] = jnp.where(alive, w, wp_ref[...])
    pd_out[...] = pd
    colsum_out[...] = col_sum
    unused_out[...] = unused.astype(jnp.int32)
    k00_out[...] = k00
    k01_out[...] = k01
    k10_out[...] = k10
    k11_out[...] = k11
    cu00_out[...] = u00
    cu01_out[...] = 0.5 * (u01 + u10)
    cu11_out[...] = u11
    zer_out[...] = r
    zeb_out[...] = b


class FusedMapUpdate(NamedTuple):
    """Plane-sized outputs of the fused map-update kernel.

    Mirrors what filters/rbphd.py:_map_update consumes downstream of the
    [P, Z, M] cubes; ``cand_w``/``cand_m`` are the hierarchical selection
    survivors laid out ``[P, new_per_z * Zc]`` in (t-major, z-minor) order —
    identical to the XLA path's ``concatenate(col_vals, axis=1)``.
    """

    w: jax.Array          # [P, M] missed-detection-updated weights
    w_prev: jax.Array     # [P, M]
    pd: jax.Array         # [P, M]
    col_sum: jax.Array    # [P, Zc] clutter + table column sums (pre-normalize)
    unused: jax.Array     # [P, Zc] bool
    cand_w: jax.Array     # [P, T*Zc]
    cand_m: jax.Array     # [P, T*Zc] int32
    K: jax.Array          # [4, P, M] gain planes (row-major 2x2)
    cov_upd: jax.Array    # [3, P, M] packed updated covariance
    z_exp: jax.Array      # [2, P, M] expected (r, b)


@functools.partial(jax.jit, static_argnames=("new_per_z", "block",
                                             "interpret"))
def fused_map_update2d(pose, mx, my, c00, c01, c11, w, w_prev, alive,
                       z, z_mask, params, *, new_per_z: int = 8,
                       block: int = 8, interpret: bool = False
                       ) -> FusedMapUpdate:
    """Run the fused kernel over particle blocks.

    ``params`` is the _N_PARAMS f32 vector (see :func:`pack_params`).
    """
    P, M = w.shape
    Zc = z.shape[0]
    T = new_per_z
    pad_p = (-P) % block

    def pad(a):
        return jnp.pad(a, ((0, pad_p),) + ((0, 0),) * (a.ndim - 1))

    Pp = P + pad_p
    pose_p = pad(pose.astype(jnp.float32))
    planes = [pad(a.astype(jnp.float32)) for a in
              (mx, my, c00, c01, c11, w, w_prev)]
    alive_p = pad(alive.astype(jnp.int32))
    zr = z[:, 0].astype(jnp.float32)[None, :]
    zb = z[:, 1].astype(jnp.float32)[None, :]
    zm = z_mask.astype(jnp.int32)[None, :]

    grid = (Pp // block,)
    bm = pl.BlockSpec((block, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bz = pl.BlockSpec((block, Zc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bc = pl.BlockSpec((block, T * Zc), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    bpose = pl.BlockSpec((block, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    bzvec = pl.BlockSpec((1, Zc), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_kernel, new_per_z),
        grid=grid,
        in_specs=[sspec, bpose] + [bm] * 7 + [bm] + [bzvec] * 3,
        out_specs=([bm, bm, bm, bz, bz, bc, bc]
                   + [bm] * 9),
        out_shape=(
            [jax.ShapeDtypeStruct((Pp, M), f32)] * 3
            + [jax.ShapeDtypeStruct((Pp, Zc), f32),
               jax.ShapeDtypeStruct((Pp, Zc), jnp.int32),
               jax.ShapeDtypeStruct((Pp, T * Zc), f32),
               jax.ShapeDtypeStruct((Pp, T * Zc), jnp.int32)]
            + [jax.ShapeDtypeStruct((Pp, M), f32)] * 9
        ),
        interpret=interpret,
    )(params, pose_p, *planes, alive_p, zr, zb, zm)

    (w_o, wp_o, pd_o, cs_o, un_o, cw_o, cm_o,
     k00, k01, k10, k11, cu00, cu01, cu11, zer, zeb) = outs
    cut = lambda a: a[:P]
    return FusedMapUpdate(
        w=cut(w_o), w_prev=cut(wp_o), pd=cut(pd_o), col_sum=cut(cs_o),
        unused=cut(un_o) > 0, cand_w=cut(cw_o), cand_m=cut(cm_o),
        K=jnp.stack([cut(k00), cut(k01), cut(k10), cut(k11)]),
        cov_upd=jnp.stack([cut(cu00), cut(cu01), cut(cu11)]),
        z_exp=jnp.stack([cut(zer), cut(zeb)]),
    )


def pack_params(meas, gates, md_threshold: float, birth_w: float):
    """Build the kernel's scalar parameter vector from a RangeBearing model
    + range-bearing innovation gates."""
    R = jnp.asarray(meas.R, jnp.float32)
    t = jnp.asarray(gates.thresholds, jnp.float32)
    return jnp.stack([
        jnp.asarray(meas.r_max, jnp.float32),
        jnp.asarray(meas.r_min, jnp.float32),
        jnp.asarray(meas.r_buf, jnp.float32),
        jnp.asarray(meas.pd_const, jnp.float32),
        jnp.asarray(meas.clutter, jnp.float32),
        R[0, 0], R[0, 1], R[1, 1],
        jnp.asarray(md_threshold * md_threshold, jnp.float32),
        jnp.asarray(birth_w, jnp.float32),
        t[0], t[1],
    ])
