"""Pallas merge kernel vs the pure-JAX merge (interpret mode on CPU)."""

import jax
import numpy as np
import jax.numpy as jnp

from rfs_slam_tpu.core.state import GMState
from rfs_slam_tpu.ops import gm as gm_ops
from rfs_slam_tpu.ops.pallas.merge2d import merge2d


def random_gm(rng, P=4, N=128, n_alive=20):
    mean = rng.uniform(-3, 3, size=(P, N, 2)).astype(np.float32)
    A = rng.normal(size=(P, N, 2, 2)).astype(np.float32) * 0.2
    cov = A @ np.swapaxes(A, -1, -2) + 0.3 * np.eye(2, dtype=np.float32)
    w = rng.uniform(0.1, 1.0, size=(P, N)).astype(np.float32)
    alive = np.zeros((P, N), bool)
    alive[:, :n_alive] = True
    return GMState.from_dense(jnp.asarray(mean), jnp.asarray(cov),
                              jnp.asarray(w), jnp.asarray(w * 0.5),
                              jnp.asarray(alive))


def test_pallas_merge_matches_jax(rng):
    gm = random_gm(rng)
    ref = gm_ops.merge(gm, threshold=1.5, f_inflation=1.5)
    # merge() sorts slots by weight at entry before dispatching to either
    # implementation; calling the kernel directly needs the same pre-sort
    out = merge2d(gm_ops.compact(gm, gm.capacity), 1.5, 1.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.alive), np.asarray(ref.alive))
    a = np.asarray(ref.alive)
    np.testing.assert_allclose(np.asarray(out.w)[a], np.asarray(ref.w)[a],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.mean)[:, a], np.asarray(ref.mean)[:, a],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.cov)[:, a], np.asarray(ref.cov)[:, a],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.w_prev)[a],
                               np.asarray(ref.w_prev)[a], rtol=1e-5)


def test_pallas_merge_absorber_tiers_bit_exact(rng):
    """With all alive slots < AK (compact guarantees it), the restricted
    absorber-axis kernel must be BIT-IDENTICAL to the full kernel."""
    for n_alive, ak in [(20, 32), (20, 64), (50, 64), (30, 32)]:
        gm = gm_ops.compact(random_gm(rng, n_alive=n_alive), 128)
        full = merge2d(gm, 1.5, 1.5, interpret=True)
        tier = merge2d(gm, 1.5, 1.5, interpret=True, ak=ak)
        for f, t in zip(jax.tree_util.tree_leaves(full),
                        jax.tree_util.tree_leaves(tier)):
            np.testing.assert_array_equal(np.asarray(f), np.asarray(t))


def test_merge_tier_invariant_alive_stays_leading(rng):
    """Merging only kills slots, so the all-alive-below-AK entry invariant
    holds through every pass: no output alive index may exceed the entry
    max alive index."""
    gm = gm_ops.compact(random_gm(rng, n_alive=40), 128)
    out = merge2d(gm, 1.5, 1.5, interpret=True, ak=64)
    out_idx = np.where(np.asarray(out.alive))[1]
    assert out_idx.max(initial=-1) < 40


def test_pallas_merge_no_pairs(rng):
    gm = random_gm(rng, n_alive=5)
    # spread the means far apart: nothing merges
    gm = gm.replace(mean=gm.mean * 100.0)
    out = merge2d(gm, 0.5, 1.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.alive), np.asarray(gm.alive))
    np.testing.assert_allclose(np.asarray(out.w), np.asarray(gm.w))


def test_pallas_merge_nonmultiple_block(rng):
    gm = random_gm(rng, P=5, N=128)  # P not a multiple of block
    ref = gm_ops.merge(gm, 1.5, 1.5)
    out = merge2d(gm_ops.compact(gm, gm.capacity), 1.5, 1.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.alive), np.asarray(ref.alive))
