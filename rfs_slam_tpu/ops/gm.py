"""Gaussian-mixture map maintenance as fixed-shape masked ops.

Replaces ``GaussianMixture<Landmark>``'s dynamic vector operations
(reference: GaussianMixture.hpp:51-534) with capacity-padded batched
equivalents:

* ``prune``    — weight-threshold pruning (GaussianMixture.hpp:477-521 keeps
                 Gaussians with w >= t);
* ``compact``  — sort-by-weight + truncate-to-capacity, the fixed-shape
                 analog of ``sortByWeight`` + vector resize;
* ``merge``    — pairwise moment-matched merging with the Mahalanobis gate and
                 covariance inflation of GaussianMixture.hpp:394-475.  The
                 reference's greedy in-order scan is inherently sequential;
                 here each pass merges a maximal set of disjoint (lowest-index
                 first) pairs and passes repeat until no pair merges, which
                 reproduces the reference's fixed point up to ordering
                 (parity is statistical, as for all order-dependent heuristics
                 — see SURVEY.md section 7);
* ``append``   — masked append of new Gaussians followed by ``compact``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rfs_slam_tpu.core import gaussian
from rfs_slam_tpu.core.state import GMState

_BIG = jnp.inf


def prune(gm: GMState, threshold) -> GMState:
    """Drop Gaussians with weight < threshold (GaussianMixture.hpp:477-521)."""
    return gm.replace(alive=gm.alive & (gm.w >= threshold))


def compact(gm: GMState, capacity: int) -> GMState:
    """Keep the top-``capacity`` Gaussians per particle by weight.

    Dead slots sort last.  This is the fixed-shape replacement for
    ``sortByWeight`` (GaussianMixture.hpp:523-529); overflow beyond capacity
    drops the lowest-weight Gaussians (the reference grows storage instead —
    capacity should be sized so this only triggers as a safety valve).
    """
    score = jnp.where(gm.alive, gm.w, -_BIG)
    _, idx = jax.lax.top_k(score, capacity)  # [P, capacity]
    take = lambda a: jnp.take_along_axis(
        a, idx.reshape(idx.shape + (1,) * (a.ndim - 2)), axis=1
    )
    return GMState(
        mean=take(gm.mean),
        cov=take(gm.cov),
        w=jnp.take_along_axis(gm.w, idx, axis=1),
        w_prev=jnp.take_along_axis(gm.w_prev, idx, axis=1),
        alive=jnp.take_along_axis(gm.alive, idx, axis=1),
    )


def append(gm: GMState, mean, cov, w, alive, capacity: int | None = None) -> GMState:
    """Append new Gaussians (w_prev = 0, GaussianMixture.hpp:267-308) and
    re-compact to capacity."""
    capacity = capacity or gm.capacity
    out = GMState(
        mean=jnp.concatenate([gm.mean, mean], axis=1),
        cov=jnp.concatenate([gm.cov, cov], axis=1),
        w=jnp.concatenate([gm.w, w], axis=1),
        w_prev=jnp.concatenate([gm.w_prev, jnp.zeros_like(w)], axis=1),
        alive=jnp.concatenate([gm.alive, alive], axis=1),
    )
    return compact(out, capacity)


def _merge_pass(gm: GMState, t2, f_inflation):
    """One parallel pass of disjoint pairwise merges.

    Gate (GaussianMixture.hpp:430-441): merge j into i (i < j) when the
    Mahalanobis distance of one mean under the other's covariance is within
    t^2 (the reference checks i->j then j->i; OR).
    """
    P, M, D = gm.mean.shape
    idx = jnp.arange(M)
    cov_inv = gaussian.inv(gm.cov)                           # [P,M,D,D]
    diff = gm.mean[:, None, :, :] - gm.mean[:, :, None, :]   # [P,i,j,D]
    d2_ij = jnp.einsum("pijd,pide,pije->pij", diff, cov_inv, diff)
    d2_ji = jnp.swapaxes(d2_ij, 1, 2)
    both_alive = gm.alive[:, :, None] & gm.alive[:, None, :]
    upper = idx[None, :, None] < idx[None, None, :]
    gate = both_alive & upper & ((d2_ij <= t2) | (d2_ji <= t2))

    # lowest-index i claims each j; each i merges with its lowest claimed j
    i_ids = jnp.broadcast_to(idx[None, :, None], gate.shape)
    first_i = jnp.min(jnp.where(gate, i_ids, M), axis=1)       # [P, j]
    claimed = gate & (i_ids == first_i[:, None, :])
    j_ids = jnp.broadcast_to(idx[None, None, :], gate.shape)
    j_star = jnp.min(jnp.where(claimed, j_ids, M), axis=2)     # [P, i]
    has_pair = j_star < M
    j_safe = jnp.where(has_pair, j_star, 0)

    take_j = lambda a: jnp.take_along_axis(
        a, j_safe.reshape(j_safe.shape + (1,) * (a.ndim - 2)), axis=1
    )
    w1, w2 = gm.w, jnp.take_along_axis(gm.w, j_safe, axis=1)
    wm = w1 + w2
    ok = has_pair & (wm != 0)
    x1, x2 = gm.mean, take_j(gm.mean)
    S1, S2 = gm.cov, take_j(gm.cov)
    xm = (x1 * w1[..., None] + x2 * w2[..., None]) / wm[..., None]
    d1 = xm - x1
    d2 = xm - x2
    outer = lambda v: v[..., :, None] * v[..., None, :]
    Sm = (
        w1[..., None, None] * (S1 + f_inflation * outer(d1))
        + w2[..., None, None] * (S2 + f_inflation * outer(d2))
    ) / wm[..., None, None]

    new_mean = jnp.where(ok[..., None], xm, gm.mean)
    new_cov = jnp.where(ok[..., None, None], Sm, gm.cov)
    new_w = jnp.where(ok, wm, gm.w)
    new_w_prev = jnp.where(ok, 0.0, gm.w_prev)
    # kill merged-away j slots
    merged_j = jnp.zeros((P, M), bool)
    merged_j = merged_j.at[jnp.arange(P)[:, None], j_safe].max(ok)
    new_alive = gm.alive & ~merged_j
    n_merged = jnp.sum(ok)
    return (
        GMState(new_mean, new_cov, new_w, new_w_prev, new_alive),
        n_merged,
    )


def merge(gm: GMState, threshold, f_inflation, max_passes: int = 8,
          impl: str | None = None) -> GMState:
    """Merge until fixed point (bounded passes).

    Reference: GaussianMixture.hpp:394-416 (O(M^2) greedy in-order scan).
    ``impl``: "pallas" | "xla" | None (auto: the Pallas kernel on TPU for 2-D
    mixtures with lane-aligned capacity).
    """
    if impl is None:
        default_dev = jax.config.jax_default_device
        platform = (default_dev.platform if default_dev is not None
                    else jax.default_backend())
        use_pallas = (
            gm.dim == 2 and gm.capacity % 128 == 0 and platform == "tpu"
        )
    else:
        use_pallas = impl == "pallas"
    if use_pallas:
        from rfs_slam_tpu.ops.pallas.merge2d import merge2d

        return merge2d(gm, threshold, f_inflation, max_passes=max_passes)

    t2 = threshold * threshold

    def cond(carry):
        _, n, it = carry
        return (n > 0) & (it < max_passes)

    def body(carry):
        g, _, it = carry
        g, n = _merge_pass(g, t2, f_inflation)
        return g, n, it + 1

    g, n0, it = _merge_pass(gm, t2, f_inflation), None, None
    gm1, n1 = g
    out, _, _ = jax.lax.while_loop(cond, body, (gm1, n1, jnp.int32(1)))
    return out
