"""Statistical tests for the systematic resampler."""

import numpy as np
import jax
import jax.numpy as jnp

from rfs_slam_tpu.ops import resample


def test_normalize():
    lw = jnp.asarray([0.0, 0.0, jnp.log(2.0)])
    out = np.exp(np.asarray(resample.normalize_log_weights(lw)))
    np.testing.assert_allclose(out, [0.25, 0.25, 0.5], rtol=1e-6)


def test_effective_count():
    n = 100
    ess = resample.effective_count(jnp.zeros((n,)))
    np.testing.assert_allclose(float(ess), n, rtol=1e-4)
    lw = jnp.full((n,), -50.0).at[0].set(0.0)
    assert float(resample.effective_count(lw)) < 1.5


def test_systematic_counts_match_weights():
    w = np.array([0.5, 0.3, 0.15, 0.05], np.float32)
    lw = jnp.log(jnp.asarray(w))
    anc = np.asarray(resample.systematic_ancestors(jax.random.PRNGKey(0), lw, 1000))
    counts = np.bincount(anc, minlength=4) / 1000.0
    # systematic resampling: counts within 1/n of the true weights
    np.testing.assert_allclose(counts, w, atol=2e-3)


def test_maybe_resample_gates():
    lw = jnp.zeros((10,))
    anc, new_lw, did = resample.maybe_resample(jax.random.PRNGKey(0), lw, ess_threshold=5.0)
    assert not bool(did)
    np.testing.assert_array_equal(np.asarray(anc), np.arange(10))
    np.testing.assert_allclose(np.asarray(new_lw), -np.log(10.0), rtol=1e-5)

    lw2 = jnp.full((10,), -50.0).at[3].set(0.0)
    anc2, new_lw2, did2 = resample.maybe_resample(jax.random.PRNGKey(0), lw2, ess_threshold=5.0)
    assert bool(did2)
    np.testing.assert_array_equal(np.asarray(anc2), np.full(10, 3))
    np.testing.assert_allclose(np.asarray(new_lw2), -np.log(10.0), rtol=1e-5)

    # force + allow flags
    _, _, did3 = resample.maybe_resample(jax.random.PRNGKey(0), lw, 5.0, force=True)
    assert bool(did3)
    _, _, did4 = resample.maybe_resample(jax.random.PRNGKey(0), lw2, 5.0, allow=False)
    assert not bool(did4)


def test_gather_particles():
    tree = {"pose": jnp.arange(12.0).reshape(4, 3), "w": jnp.arange(4.0)}
    anc = jnp.asarray([2, 2, 0, 1], jnp.int32)
    out = resample.gather_particles(tree, anc)
    np.testing.assert_allclose(np.asarray(out["w"]), [2, 2, 0, 1])
    np.testing.assert_allclose(np.asarray(out["pose"][0]), [6, 7, 8])
