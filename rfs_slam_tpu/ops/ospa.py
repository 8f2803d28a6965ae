"""OSPA and COLA set-error metrics.

Reference: OSPA.hpp:56-250 and COLA.hpp:45-103.  The cost matrix is the
pairwise Euclidean distance clipped at the cutoff ``c``, padded square with
``c`` for cardinality mismatch, optimally matched with the Hungarian method;

    OSPA  = ( sum_i C[i, pi(i)]^p / n )^(1/p),   n = max(|X|, |Y|)
    COLA  = OSPA * n^(1/p) / c

``calc`` splits the error into localization (matched pairs with distance
< c) and cardinality (assignments at the cutoff) components exactly like
``OSPA::calcError`` (OSPA.hpp:179-199).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rfs_slam_tpu.ops.assignment import hungarian


class SetError(NamedTuple):
    ospa: jax.Array
    cola: jax.Array
    loc: jax.Array    # e_dist: sum of matched sub-cutoff distances
    card: jax.Array   # e_card: sum of cutoff-valued assignments


def ospa(x: jax.Array, x_mask: jax.Array, y: jax.Array, y_mask: jax.Array,
         cutoff: float, order: float = 1.0) -> SetError:
    """OSPA/COLA between two padded point sets.

    ``x``: [Nx, D] with mask [Nx]; ``y``: [Ny, D] with mask [Ny].  Runs on a
    fixed n = Nx + Ny square (masked-out entries behave as cardinality
    padding), so it is jit/vmap friendly for per-timestep evaluation.
    """
    nx = jnp.sum(x_mask)
    ny = jnp.sum(y_mask)
    n = jnp.maximum(nx, ny)
    N = x.shape[0] + y.shape[0]

    d = jnp.linalg.norm(x[:, None, :] - y[None, :, :], axis=-1)
    d = jnp.minimum(d, cutoff)
    d = jnp.where(x_mask[:, None] & y_mask[None, :], d, cutoff)

    C = jnp.full((N, N), cutoff, d.dtype)
    C = C.at[: x.shape[0], : y.shape[0]].set(d)
    # only the first max(nx, ny) rows/cols represent the OSPA square matrix;
    # the rest are cutoff-cutoff pairs that we subtract afterwards.
    sol, _ = hungarian(-C)  # hungarian maximizes; negate for min cost
    picked = C[jnp.arange(N), sol]

    # rows representing real x's or padding within the n x n square
    # contribute; surplus padded rows beyond n each contribute cutoff.
    total_p = jnp.sum(picked**order) - (N - n) * cutoff**order
    cost = (total_p / jnp.maximum(n, 1)) ** (1.0 / order)
    cost = jnp.where(n == 0, 0.0, cost)

    at_cut = picked >= cutoff - 1e-12
    loc = jnp.sum(jnp.where(at_cut, 0.0, picked))
    card = jnp.sum(jnp.where(at_cut, picked, 0.0)) - (N - n) * cutoff
    cola = cost * jnp.maximum(n, 1) ** (1.0 / order) / cutoff
    cola = jnp.where(n == 0, 0.0, cola)
    return SetError(ospa=cost, cola=cola, loc=loc, card=card)
