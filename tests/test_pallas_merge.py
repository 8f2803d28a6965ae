"""Pallas merge kernel vs the pure-JAX merge (interpret mode on CPU)."""

import jax
import numpy as np
import pytest
import jax.numpy as jnp

from rfs_slam_tpu.core.state import GMState
from rfs_slam_tpu.ops import gm as gm_ops
from rfs_slam_tpu.ops.pallas.merge2d import merge2d


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
    absorber-axis kernel computes the SAME merges as the full kernel.

    Discrete outcomes (which slots survive) must match exactly.  Float
    leaves are compared to ~1 ulp rather than bitwise: in interpret mode
    both variants are separate XLA:CPU programs, and CPU codegen is not
    deterministic across process history (observed: 3/1536 elements off by
    exactly 1 ulp only when another large program compiled first in the
    same process).  The bitwise claim holds on TPU, where the Mosaic
    kernel's per-lane arithmetic is shape-independent for live rows — the
    on-chip parity drive pins it (PERF.md round-5 section)."""
    for n_alive, ak in [(20, 32), (20, 64), (50, 64), (30, 32)]:
        gm = gm_ops.compact(random_gm(rng, n_alive=n_alive), 128)
        full = merge2d(gm, 1.5, 1.5, interpret=True)
        tier = merge2d(gm, 1.5, 1.5, interpret=True, ak=ak)
        np.testing.assert_array_equal(np.asarray(full.alive),
                                      np.asarray(tier.alive))
        for f, t in zip(jax.tree_util.tree_leaves(full),
                        jax.tree_util.tree_leaves(tier)):
            f, t = np.asarray(f), np.asarray(t)
            if f.dtype == bool:
                np.testing.assert_array_equal(f, t)
            else:
                np.testing.assert_allclose(f, t, rtol=3e-7, atol=1e-7)


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
