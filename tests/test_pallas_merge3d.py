"""Pallas D=3 merge kernel vs the pure-JAX merge (interpret mode on CPU)."""

import jax
import numpy as np
import pytest
import jax.numpy as jnp

from rfs_slam_tpu.core.state import GMState
from rfs_slam_tpu.ops import gm as gm_ops
from rfs_slam_tpu.ops.pallas.merge3d import merge3d


@pytest.fixture(autouse=True)
def _private_compile_cache(tmp_path):
    """Compile every variant in this module fresh, in-process.

    The bit-exactness tests here compare two separately-compiled XLA
    programs.  The persistent cache can hand one of them an executable
    compiled under a DIFFERENT CPU feature regime — the axon PJRT plugin
    injects prefer-no-scatter/gather into XLA:CPU target features once its
    backend initializes, so entries written before/after that (or by
    another process) mix in one suite run and differ in f32 codegen,
    breaking bit-equality between semantically identical kernels.  A
    per-test cache dir forces both variants through the same in-process
    compile regime, which is what the bit-exactness claim is about.
    """
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    jax.clear_caches()   # drop in-memory executables from earlier regimes
    yield
    jax.config.update("jax_compilation_cache_dir", old)


def random_gm3(rng, P=3, N=128, n_alive=24):
    mean = rng.uniform(-3, 3, size=(P, N, 3)).astype(np.float32)
    mean[..., 2] = rng.uniform(0.2, 1.0, size=(P, N))  # tree diameters
    A = rng.normal(size=(P, N, 3, 3)).astype(np.float32) * 0.2
    cov = A @ np.swapaxes(A, -1, -2) + 0.3 * np.eye(3, dtype=np.float32)
    w = rng.uniform(0.1, 1.0, size=(P, N)).astype(np.float32)
    alive = np.zeros((P, N), bool)
    alive[:, :n_alive] = True
    return GMState.from_dense(jnp.asarray(mean), jnp.asarray(cov),
                              jnp.asarray(w), jnp.asarray(w * 0.5),
                              jnp.asarray(alive))


def test_pallas_merge3d_matches_jax(rng):
    gm = random_gm3(rng)
    ref = gm_ops.merge(gm, threshold=1.5, f_inflation=1.5)
    out = merge3d(gm_ops.compact(gm, gm.capacity), 1.5, 1.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.alive), np.asarray(ref.alive))
    a = np.asarray(ref.alive)
    np.testing.assert_allclose(np.asarray(out.w)[a], np.asarray(ref.w)[a],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.mean)[:, a],
                               np.asarray(ref.mean)[:, a],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.cov)[:, a],
                               np.asarray(ref.cov)[:, a],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.w_prev)[a],
                               np.asarray(ref.w_prev)[a], rtol=1e-5)


def test_pallas_merge3d_mass_conserved(rng):
    gm = gm_ops.compact(random_gm3(rng, n_alive=40), 128)
    out = merge3d(gm, 2.0, 1.0, interpret=True)
    m_in = float(jnp.sum(jnp.where(gm.alive, gm.w, 0.0)))
    m_out = float(jnp.sum(jnp.where(out.alive, out.w, 0.0)))
    np.testing.assert_allclose(m_out, m_in, rtol=1e-5)


def test_pallas_merge3d_absorber_tiers_bit_exact(rng):
    # discrete outcomes exact; float leaves to ~1 ulp — see the 2-D
    # variant's docstring (XLA:CPU codegen is not deterministic across
    # process history; the bitwise claim is pinned on TPU)
    for n_alive, ak in [(20, 32), (40, 64), (24, 32)]:
        gm = gm_ops.compact(random_gm3(rng, n_alive=n_alive), 128)
        full = merge3d(gm, 1.5, 1.5, interpret=True)
        tier = merge3d(gm, 1.5, 1.5, interpret=True, ak=ak)
        np.testing.assert_array_equal(np.asarray(full.alive),
                                      np.asarray(tier.alive))
        for f, t in zip(jax.tree_util.tree_leaves(full),
                        jax.tree_util.tree_leaves(tier)):
            f, t = np.asarray(f), np.asarray(t)
            if f.dtype == bool:
                np.testing.assert_array_equal(f, t)
            else:
                np.testing.assert_allclose(f, t, rtol=3e-7, atol=1e-7)


def test_pallas_merge3d_no_pairs(rng):
    gm = random_gm3(rng, n_alive=5)
    gm = gm.replace(mean=gm.mean * 100.0)
    out = merge3d(gm, 0.5, 1.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.alive), np.asarray(gm.alive))
    np.testing.assert_allclose(np.asarray(out.w), np.asarray(gm.w))
