"""SoA state containers for the particle filters.

The reference stores particles as shared-ptr object graphs
(``Particle<PoseType, DataType>`` with a per-particle ``GaussianMixture``
object, reference: Particle.hpp:47-150, GaussianMixture.hpp:51-224).  On TPU
the same information is a handful of fixed-shape arrays with an explicit
alive-mask, so that every filter phase is a dense batched program and
resampling is a single gather along the particle axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class GMState(struct.PyTreeNode):
    """Per-particle Gaussian-mixture map, padded to capacity M.

    Replaces ``GaussianMixture<Landmark>``'s
    ``std::vector<Gaussian{Landmark*, w, w_prev}>``
    (reference: GaussianMixture.hpp:60-64, 190-192).

    Attributes:
      mean:   [P, M, D]    Gaussian means.
      cov:    [P, M, D, D] Gaussian covariances.
      w:      [P, M]       current weights (GM-PHD intensity weights for the
                           RB-PHD filter; log-odds existence weights for
                           FastSLAM).
      w_prev: [P, M]       weight before the last update
                           (GaussianMixture.hpp:339-344; new Gaussians get 0).
      alive:  [P, M] bool  slot-occupied mask.
    """

    mean: jax.Array
    cov: jax.Array
    w: jax.Array
    w_prev: jax.Array
    alive: jax.Array

    @classmethod
    def empty(cls, n_particles: int, capacity: int, dim: int, dtype=jnp.float32):
        return cls(
            mean=jnp.zeros((n_particles, capacity, dim), dtype),
            cov=jnp.broadcast_to(
                jnp.eye(dim, dtype=dtype), (n_particles, capacity, dim, dim)
            ),
            w=jnp.zeros((n_particles, capacity), dtype),
            w_prev=jnp.zeros((n_particles, capacity), dtype),
            alive=jnp.zeros((n_particles, capacity), bool),
        )

    @property
    def n_particles(self) -> int:
        return self.mean.shape[0]

    @property
    def capacity(self) -> int:
        return self.mean.shape[1]

    @property
    def dim(self) -> int:
        return self.mean.shape[2]

    def count(self) -> jax.Array:
        """Number of live Gaussians per particle, [P]."""
        return jnp.sum(self.alive, axis=-1)


class BirthCandidates(struct.PyTreeNode):
    """Masked state machine replacing the per-particle
    ``std::list<BirthGaussianCandidate>`` of the RB-PHD filter
    (reference: RBPHDFilter.hpp:171-178, 1000-1084) and the identical
    ``LandmarkCandidate`` list of FastSLAM (FastSLAM.hpp:160-167).

    Attributes:
      mean:      [P, C, D]
      cov:       [P, C, D, D]
      n_support: [P, C] int32  supporting-measurement count.
      n_checks:  [P, C] int32  checks since creation.
      alive:     [P, C] bool
    """

    mean: jax.Array
    cov: jax.Array
    n_support: jax.Array
    n_checks: jax.Array
    alive: jax.Array

    @classmethod
    def empty(cls, n_particles: int, capacity: int, dim: int, dtype=jnp.float32):
        return cls(
            mean=jnp.zeros((n_particles, capacity, dim), dtype),
            cov=jnp.broadcast_to(
                jnp.eye(dim, dtype=dtype), (n_particles, capacity, dim, dim)
            ),
            n_support=jnp.zeros((n_particles, capacity), jnp.int32),
            n_checks=jnp.zeros((n_particles, capacity), jnp.int32),
            alive=jnp.zeros((n_particles, capacity), bool),
        )

    @property
    def capacity(self) -> int:
        return self.mean.shape[1]


class ParticleState(struct.PyTreeNode):
    """The particle set (replaces ParticleFilter.hpp:48-208 bookkeeping).

    Attributes:
      pose:   [P, DX]  particle poses (x, y, theta for 2-D).
      log_w:  [P]      log importance weights.
      parent: [P] int32 ancestor index from the last resample
                        (Particle::setParentId, ParticleFilter.hpp:446-479).
      key:    [2]/typed jax.random key for this state's RNG stream.
    """

    pose: jax.Array
    log_w: jax.Array
    parent: jax.Array
    key: jax.Array

    @classmethod
    def init(cls, key: jax.Array, n_particles: int, pose0: Any, dtype=jnp.float32):
        pose0 = jnp.asarray(pose0, dtype)
        return cls(
            pose=jnp.broadcast_to(pose0, (n_particles,) + pose0.shape),
            log_w=jnp.zeros((n_particles,), dtype),
            parent=jnp.arange(n_particles, dtype=jnp.int32),
            key=key,
        )

    @property
    def n_particles(self) -> int:
        return self.pose.shape[0]
