"""Batched per-landmark EKF correction — the hot inner kernel.

The reference's hottest loop is ``KalmanFilter::correct`` with one landmark
against all measurements, called per particle x per landmark inside the RB-PHD
map update (reference: KalmanFilter.hpp:261-342, called from
RBPHDFilter.hpp:597-641).  Here the whole ``[P, M]`` landmark batch is
corrected against the whole ``[Z]`` measurement batch in one shot:

* per (particle, landmark): expected measurement, innovation covariance
  S = H Sigma H^T + R, gain K = Sigma H^T S^-1, updated covariance
  (I - K H) Sigma symmetrized (KalmanFilter.hpp:240-245) — shared across all
  measurements exactly as in the multi-measurement ``correct``;
* per (particle, landmark, measurement): innovation (with the rotation-aware
  wrap and innovation gates of KalmanFilter_RngBrg.cpp:52-65), updated mean,
  Gaussian likelihood, and squared Mahalanobis distance.

All "abort update" conditions of the reference become masks in the returned
``valid`` array: invalid expected measurement (measure() returning false),
innovation-gate failures, and the NaN-likelihood guard
(KalmanFilter.hpp:253-254).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from rfs_slam_tpu.core import gaussian


class InnovationGates(struct.PyTreeNode):
    """Innovation gating config of the rotation-aware KF subclasses.

    ``wrap_dims`` marks measurement components that are angles (wrapped to
    +-pi before gating); thresholds < 0 disable the gate, matching the
    reference defaults (KalmanFilter_RngBrg.cpp:40-43).
    """

    thresholds: jax.Array  # [DZ]; <0 disables
    wrap_dims: tuple = struct.field(pytree_node=False, default=())

    @classmethod
    def range_bearing(cls, range_t: float = -1.0, bearing_t: float = -1.0):
        """KalmanFilter_RngBrg gates (reference: KalmanFilter_RngBrg.cpp:52-65)."""
        return cls(thresholds=jnp.array([range_t, bearing_t]), wrap_dims=(1,))

    @classmethod
    def none(cls, dz: int):
        return cls(thresholds=-jnp.ones((dz,)), wrap_dims=())

    def innovation(self, z_exp: jax.Array, z_act: jax.Array):
        """Returns (innovation, pass_mask)."""
        innov = z_act - z_exp
        for d in self.wrap_dims:
            innov = innov.at[..., d].set(gaussian.wrap_angle(innov[..., d]))
        gate_on = self.thresholds > 0
        ok = jnp.all(
            jnp.where(gate_on, jnp.abs(innov) <= self.thresholds, True), axis=-1
        )
        return innov, ok


class EKFCorrection(NamedTuple):
    """Output of :func:`correct_all`.

    Shapes: P = particles, M = landmarks, Z = measurements, D = landmark dim,
    DZ = measurement dim.
    """

    z_exp: jax.Array     # [P, M, DZ]
    S: jax.Array         # [P, M, DZ, DZ]
    K: jax.Array         # [P, M, D, DZ]
    cov_upd: jax.Array   # [P, M, D, D]   shared across measurements
    mean_upd: jax.Array  # [P, M, Z, D]   per-measurement updated means
    likelihood: jax.Array  # [P, M, Z]    N(z; z_exp, S), 0 where invalid
    md2: jax.Array       # [P, M, Z]
    valid: jax.Array     # [P, M, Z] bool (measure-valid & gates passed)
    measure_valid: jax.Array  # [P, M] bool


def correct_all(model, gates: InnovationGates, pose: jax.Array,
                lm_mean: jax.Array, lm_cov: jax.Array,
                z: jax.Array) -> EKFCorrection:
    """One-landmark-times-all-measurements EKF correction, fully batched.

    Args:
      model: a measurement model from :mod:`rfs_slam_tpu.models.measurement`.
      gates: innovation gates (rotation-aware subclass behavior).
      pose:  [P, 3] particle poses.
      lm_mean: [P, M, D] landmark means.
      lm_cov:  [P, M, D, D] landmark covariances.
      z: [Z, DZ] (or [P, Z, DZ]) measurements; invalid entries are masked by
        the caller via the returned per-measurement arrays.
    """
    pred = model.measure(pose[:, None, :], lm_mean, lm_cov)  # [P, M, ...]
    S_inv = gaussian.inv(pred.S)
    Ht = jnp.swapaxes(pred.H_lmk, -1, -2)                      # [P,M,D,DZ]
    K = lm_cov @ Ht @ S_inv                                    # [P,M,D,DZ]
    d = lm_mean.shape[-1]
    I = jnp.eye(d, dtype=lm_mean.dtype)
    cov_upd = gaussian.symmetrize((I - K @ pred.H_lmk) @ lm_cov)

    if z.ndim == 2:
        z_b = z[None, None, :, :]                              # [1,1,Z,DZ]
    else:
        z_b = z[:, None, :, :]                                 # [P,1,Z,DZ]
    innov, gate_ok = gates.innovation(pred.z[:, :, None, :], z_b)  # [P,M,Z,DZ]
    mean_upd = lm_mean[:, :, None, :] + jnp.einsum(
        "pmij,pmzj->pmzi", K, innov
    )
    # Likelihood of the *raw* measurement under N(z_exp, S); note the
    # reference evaluates N(z; z_exp, S) with the unwrapped difference via
    # RandomVec::evalGaussianLikelihood — we use the wrapped innovation, which
    # matches it whenever the innovation gate passes (bearing wrapped into
    # +-pi) and is the mathematically intended value otherwise.
    md2 = gaussian.quad_form(S_inv[:, :, None, :, :], innov)
    dz = z_b.shape[-1]
    norm = jnp.sqrt(jnp.power(2.0 * jnp.pi, dz) * gaussian.det(pred.S))
    lik = jnp.exp(-0.5 * md2) / norm[:, :, None]
    lik = jnp.where(jnp.isfinite(lik), lik, 0.0)

    valid = gate_ok & pred.valid[:, :, None]
    lik = jnp.where(valid, lik, 0.0)
    return EKFCorrection(
        z_exp=pred.z, S=pred.S, K=K, cov_upd=cov_upd, mean_upd=mean_upd,
        likelihood=lik, md2=md2, valid=valid, measure_valid=pred.valid,
    )


def correct_single(model, gates: InnovationGates, pose: jax.Array,
                   lm_mean: jax.Array, lm_cov: jax.Array, z: jax.Array):
    """Single-measurement EKF correct for each landmark in the batch.

    ``pose`` (..., 3), ``lm_mean`` (..., D), ``lm_cov`` (..., D, D),
    ``z`` (..., DZ) — all batch axes aligned.  Returns
    ``(mean_upd, cov_upd, likelihood, md2, valid)``; where invalid, the
    original landmark is returned unchanged (the reference skips the update,
    KalmanFilter.hpp:215-217).
    """
    pred = model.measure(pose, lm_mean, lm_cov)
    S_inv = gaussian.inv(pred.S)
    Ht = jnp.swapaxes(pred.H_lmk, -1, -2)
    K = lm_cov @ Ht @ S_inv
    d = lm_mean.shape[-1]
    I = jnp.eye(d, dtype=lm_mean.dtype)
    cov_upd = gaussian.symmetrize((I - K @ pred.H_lmk) @ lm_cov)
    innov, gate_ok = gates.innovation(pred.z, z)
    mean_upd = lm_mean + jnp.einsum("...ij,...j->...i", K, innov)
    md2 = gaussian.quad_form(S_inv, innov)
    dz = z.shape[-1]
    norm = jnp.sqrt(jnp.power(2.0 * jnp.pi, dz) * gaussian.det(pred.S))
    lik = jnp.exp(-0.5 * md2) / norm
    lik = jnp.where(jnp.isfinite(lik), lik, 0.0)
    valid = gate_ok & pred.valid
    mean_out = jnp.where(valid[..., None], mean_upd, lm_mean)
    cov_out = jnp.where(valid[..., None, None], cov_upd, lm_cov)
    return mean_out, cov_out, jnp.where(valid, lik, 0.0), md2, valid
