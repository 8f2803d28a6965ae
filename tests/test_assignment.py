"""Assignment solver tests vs brute force and scipy."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfs_slam_tpu.ops.assignment import (
    brute_force_assignments, hungarian, hungarian_batched, matrix_permanent,
    murty,
)


@pytest.mark.parametrize("n", [2, 3, 5, 7])
def test_hungarian_matches_bruteforce(rng, n):
    for _ in range(5):
        cost = rng.normal(size=(n, n)).astype(np.float32) * 3
        sol, total = hungarian(jnp.asarray(cost))
        perms, scores = brute_force_assignments(cost, k=1)
        np.testing.assert_allclose(float(total), scores[0], rtol=1e-5)
        np.testing.assert_allclose(
            cost[np.arange(n), np.asarray(sol)].sum(), scores[0], rtol=1e-5
        )


def test_hungarian_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment

    for n in [4, 8, 16, 32]:
        cost = rng.normal(size=(n, n)).astype(np.float32) * 5
        sol, total = hungarian(jnp.asarray(cost))
        r, c = linear_sum_assignment(cost, maximize=True)
        np.testing.assert_allclose(float(total), cost[r, c].sum(), rtol=1e-4)


def test_hungarian_batched(rng):
    costs = rng.normal(size=(6, 5, 5)).astype(np.float32)
    sols, totals = hungarian_batched(jnp.asarray(costs))
    for b in range(6):
        _, scores = brute_force_assignments(costs[b], k=1)
        np.testing.assert_allclose(float(totals[b]), scores[0], rtol=1e-4)


@pytest.mark.parametrize("n,k", [(3, 4), (4, 6), (5, 5)])
def test_murty_kbest(rng, n, k):
    cost = rng.normal(size=(n, n)).astype(np.float32) * 2
    sols, scores, valid = murty(jnp.asarray(cost), k)
    perms, bf_scores = brute_force_assignments(cost, k=k)
    assert bool(np.all(np.asarray(valid)))
    np.testing.assert_allclose(np.asarray(scores), bf_scores[:k], rtol=1e-4)
    # solutions must be distinct
    seen = {tuple(np.asarray(s)) for s in sols}
    assert len(seen) == k


def test_murty_exhaustion(rng):
    # 2x2 has only 2 assignments; asking for 4 marks the rest invalid
    cost = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    sols, scores, valid = murty(cost, 4)
    assert bool(valid[0]) and bool(valid[1])
    assert not bool(valid[2]) and not bool(valid[3])
    np.testing.assert_allclose(np.asarray(scores[:2]), [2.0, 0.0])


def test_matrix_permanent():
    # permanent of all-ones n x n = n!
    for n in [2, 3, 4, 5]:
        p = matrix_permanent(jnp.ones((n, n)))
        np.testing.assert_allclose(float(p), float(math.factorial(n)), rtol=1e-5)
    # reference's gtest anchor: permanent of (J - I), n=2..6 -> derangement-ish
    # values: per MatrixPermanentTest.hpp these are n-th "menage-like" numbers
    expect = {2: 1, 3: 2, 4: 9, 5: 44, 6: 265}  # permanent(J-I) = derangements
    for n, e in expect.items():
        p = matrix_permanent(jnp.ones((n, n)) - jnp.eye(n))
        np.testing.assert_allclose(float(p), e, rtol=1e-5)
