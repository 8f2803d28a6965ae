"""Golden tests for the batched Gaussian toolkit vs dense NumPy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfs_slam_tpu.core import gaussian


def random_spd(rng, n, d):
    A = rng.normal(size=(n, d, d))
    return A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(d)


@pytest.mark.parametrize("d", [1, 2, 3])
def test_det_inv_chol(rng, d):
    S = random_spd(rng, 16, d).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gaussian.det(jnp.asarray(S))), np.linalg.det(S), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(gaussian.inv(jnp.asarray(S))), np.linalg.inv(S),
        rtol=2e-3, atol=2e-3,
    )
    L = np.asarray(gaussian.chol(jnp.asarray(S)))
    np.testing.assert_allclose(L @ np.swapaxes(L, -1, -2), S, rtol=1e-3, atol=1e-4)


def test_likelihood_matches_formula(rng):
    d = 2
    S = random_spd(rng, 8, d).astype(np.float32)
    mu = rng.normal(size=(8, d)).astype(np.float32)
    x = rng.normal(size=(8, d)).astype(np.float32)
    lik, md2 = gaussian.eval_likelihood(jnp.asarray(mu), jnp.asarray(S), jnp.asarray(x))
    e = x - mu
    md2_np = np.einsum("ni,nij,nj->n", e, np.linalg.inv(S), e)
    lik_np = np.exp(-0.5 * md2_np) / np.sqrt((2 * np.pi) ** d * np.linalg.det(S))
    np.testing.assert_allclose(np.asarray(md2), md2_np, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lik), lik_np, rtol=1e-3, atol=1e-6)

    logp, _ = gaussian.log_likelihood(jnp.asarray(mu), jnp.asarray(S), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jnp.exp(logp)), lik_np, rtol=1e-3, atol=1e-6)


def test_likelihood_nan_guard():
    mu = jnp.zeros((2,))
    S = jnp.eye(2) * 1e-38  # near-degenerate: exp(-md2/2) underflows to 0/0
    lik, _ = gaussian.eval_likelihood(mu, S, jnp.ones((2,)) * 100.0)
    assert np.isfinite(float(lik))


def test_sample_moments():
    key = jax.random.PRNGKey(1)
    mu = jnp.asarray([1.0, -2.0])
    S = jnp.asarray([[0.5, 0.2], [0.2, 0.4]])
    xs = gaussian.sample(key, jnp.broadcast_to(mu, (20000, 2)),
                         jnp.broadcast_to(S, (20000, 2, 2)))
    xs = np.asarray(xs)
    np.testing.assert_allclose(xs.mean(0), np.asarray(mu), atol=0.02)
    np.testing.assert_allclose(np.cov(xs.T), np.asarray(S), atol=0.02)


def test_wrap_angle():
    a = jnp.asarray([0.0, 3.2, -3.2, 7.0, -7.0, np.pi, -np.pi])
    w = np.asarray(gaussian.wrap_angle(a))
    assert np.all(w <= np.pi + 1e-6) and np.all(w >= -np.pi - 1e-6)
    np.testing.assert_allclose(np.cos(w), np.cos(np.asarray(a)), atol=1e-5)
    np.testing.assert_allclose(np.sin(w), np.sin(np.asarray(a)), atol=1e-5)
