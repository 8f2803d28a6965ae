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


@pytest.mark.parametrize("n,k,cap", [(4, 6, 3), (5, 5, 4), (5, 4, 2)])
def test_murty_child_cap(rng, n, k, cap):
    """child_cap >= n-1 is exactly the uncapped solver; any cap keeps the
    best solution exact and every returned solution a genuine assignment
    with its true score, in descending order."""
    cost = rng.normal(size=(n, n)).astype(np.float32) * 2
    # cap >= n-1: identical to uncapped
    s_ref, sc_ref, v_ref = murty(jnp.asarray(cost), k)
    s_eq, sc_eq, v_eq = murty(jnp.asarray(cost), k, child_cap=n - 1)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_eq))
    np.testing.assert_allclose(np.asarray(sc_ref), np.asarray(sc_eq))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_eq))
    # tight cap: best exact, scores true + descending, solutions distinct
    sols, scores, valid = murty(jnp.asarray(cost), k, child_cap=cap)
    perms, bf_scores = brute_force_assignments(cost, k=None)
    np.testing.assert_allclose(float(scores[0]), bf_scores[0], rtol=1e-4)
    prev = np.inf
    seen = set()
    for i in range(k):
        if not bool(valid[i]):
            continue
        sol = np.asarray(sols[i])
        true = sum(cost[r, sol[r]] for r in range(n))
        np.testing.assert_allclose(float(scores[i]), true, rtol=1e-4)
        assert float(scores[i]) <= prev + 1e-5
        prev = float(scores[i])
        assert tuple(sol) not in seen
        seen.add(tuple(sol))


@pytest.mark.parametrize("n", [3, 5, 7])
def test_hungarian_dual_child_bound(rng, n):
    """The duals certify child_best <= parent_best - min slack of the banned
    row (the Murty dual bound): verify against explicitly solved children."""
    from rfs_slam_tpu.ops.assignment import _hungarian_uv

    for _ in range(5):
        cost = rng.normal(size=(n, n)).astype(np.float32) * 3
        sol, total, u, v = _hungarian_uv(jnp.asarray(cost))
        a = -np.asarray(cost)
        slack = a - np.asarray(u)[1:, None] - np.asarray(v)[None, 1:]
        # dual feasibility + complementary slackness
        assert slack.min() >= -1e-4
        np.testing.assert_allclose(
            slack[np.arange(n), np.asarray(sol)], 0.0, atol=1e-4)
        sol = np.asarray(sol)
        for r in range(n):
            gap = min(slack[r, j] for j in range(n) if j != sol[r])
            banned = cost.copy()
            banned[r, sol[r]] = -1e9
            _, child_total = hungarian(jnp.asarray(banned))
            assert float(child_total) <= float(total) - gap + 1e-3


@pytest.mark.parametrize("n,k,window", [(4, 6, 2.0), (5, 8, 3.0), (5, 4, 1.0)])
def test_murty_prune_window_exact(rng, n, k, window):
    """With child_cap >= n-1 the window-pruned solver returns EXACTLY the
    brute-force top-k assignments within `window` of the best."""
    for _ in range(5):
        cost = rng.normal(size=(n, n)).astype(np.float32) * 2
        sols, scores, valid = murty(jnp.asarray(cost), k, child_cap=n - 1,
                                    prune_window=window)
        perms, bf_scores = brute_force_assignments(cost, k=None)
        in_win = bf_scores >= bf_scores[0] - window
        want = min(int(in_win.sum()), k)
        got = int(np.asarray(valid).sum())
        assert got == want, (got, want)
        np.testing.assert_allclose(np.asarray(scores[:got]),
                                   bf_scores[:got], rtol=1e-4)
        seen = {tuple(np.asarray(s)) for s in np.asarray(sols)[:got]}
        assert len(seen) == got


def test_murty_prune_window_capped_stays_sound(rng):
    """A tight cap + window: every returned hypothesis is a true-scored,
    distinct, in-window assignment and the best is exact."""
    n, k = 6, 5
    for _ in range(3):
        cost = rng.normal(size=(n, n)).astype(np.float32) * 2
        sols, scores, valid = murty(jnp.asarray(cost), k, child_cap=2,
                                    prune_window=3.0)
        perms, bf_scores = brute_force_assignments(cost, k=None)
        np.testing.assert_allclose(float(scores[0]), bf_scores[0], rtol=1e-4)
        seen = set()
        for i in range(k):
            if not bool(valid[i]):
                continue
            sol = np.asarray(sols[i])
            true = sum(cost[r, sol[r]] for r in range(n))
            np.testing.assert_allclose(float(scores[i]), true, rtol=1e-4)
            assert float(scores[0]) - float(scores[i]) <= 3.0 + 1e-4
            assert tuple(sol) not in seen
            seen.add(tuple(sol))


def test_murty_return_nvalid(rng):
    n, k = 5, 4
    cost = rng.normal(size=(n, n)).astype(np.float32)
    sols, scores, valid, nvalid = murty(jnp.asarray(cost), k, child_cap=2,
                                        return_nvalid=True)
    assert nvalid.shape == (k - 1,)
    # wave 0 expands the root: all n-1 candidate rows are free
    assert int(nvalid[0]) == n - 1
    # and the capped run still returns the exact best
    _, bf_scores = brute_force_assignments(cost, k=1)
    np.testing.assert_allclose(float(scores[0]), bf_scores[0], rtol=1e-4)


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


def test_cost_partition_components():
    import jax.numpy as jnp
    from rfs_slam_tpu.ops.assignment import cost_partition

    # rows 0,1 share col 0; row 2 alone with col 2; row 3 isolated
    gate = jnp.asarray([
        [1, 0, 0],
        [1, 1, 0],
        [0, 0, 1],
        [0, 0, 0],
    ], bool)
    row, col = cost_partition(gate)
    row, col = np.asarray(row), np.asarray(col)
    assert row[0] == row[1] == col[0] == col[1]
    assert row[2] == col[2] and row[2] != row[0]
    assert row[3] not in (row[0], row[2])


def test_cost_partition_matches_networkx_style_oracle(rng):
    import jax.numpy as jnp
    from rfs_slam_tpu.ops.assignment import cost_partition

    R, C = 12, 9
    gate = rng.random((R, C)) < 0.15
    row, col = cost_partition(jnp.asarray(gate))
    row, col = np.asarray(row), np.asarray(col)
    # oracle: union-find over the bipartite graph
    parent = list(range(R + C))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in range(R):
        for c in range(C):
            if gate[r, c]:
                a, b = find(r), find(R + c)
                parent[a] = b
    for r1 in range(R):
        for r2 in range(R):
            same_ref = find(r1) == find(r2)
            assert (row[r1] == row[r2]) == same_ref
    for r in range(R):
        for c in range(C):
            same_ref = find(r) == find(R + c)
            assert (row[r] == col[c]) == same_ref


def test_cost_reduce_fixes_unique_entries():
    import jax.numpy as jnp
    from rfs_slam_tpu.ops.assignment import cost_reduce

    # (0, 2) is the only above-floor entry in row 0 AND col 2 -> fixed;
    # rows 1-2 x cols 0-1 stay as the reduced block (single pass, no
    # fixed-point iteration — CostMatrix.cpp:274-315)
    cost = jnp.asarray([
        [0.0, 0.0, 9.0],
        [8.0, 7.0, 0.0],
        [6.0, 4.0, 0.0],
    ])
    fixed, row_free, col_free = cost_reduce(cost, lim=1.0)
    fixed = np.asarray(fixed)
    assert fixed[0] == 2
    assert fixed[1] == -1 and fixed[2] == -1
    assert not bool(row_free[0]) and not bool(col_free[2])
    assert bool(row_free[1]) and bool(row_free[2])
    assert bool(col_free[0]) and bool(col_free[1])


def test_cost_reduce_single_remaining_pair_quirk():
    import jax.numpy as jnp
    from rfs_slam_tpu.ops.assignment import cost_reduce

    # 2x2: (0,0) unique in row 0 and col 0 -> fixed; the lone remaining
    # (1,1) is then forced too (CostMatrix.cpp:332-337)
    cost = jnp.asarray([
        [9.0, 0.0],
        [0.0, 0.5],
    ])
    fixed, row_free, col_free = cost_reduce(cost, lim=1.0)
    fixed = np.asarray(fixed)
    assert fixed[0] == 0 and fixed[1] == 1
    assert not row_free.any() and not col_free.any()


def test_permutations_lexicographic_counts_and_order():
    from rfs_slam_tpu.ops.assignment import permutations_lexicographic

    # 2 landmarks x 2 measurements: assignments where each lm takes a
    # distinct z or the miss symbol (=2): count = 7
    perms = permutations_lexicographic(2, 2)
    assert perms.shape == (7, 2)
    # lexicographic order
    as_tuples = [tuple(p) for p in perms]
    assert as_tuples == sorted(as_tuples)
    # distinctness of real assignments
    for p in as_tuples:
        real = [c for c in p if c < 2]
        assert len(set(real)) == len(real)


def _real_block_pattern(sol, n_real_rows, n_real_cols):
    """Collapse an assignment to its real-block content: for each real row,
    the real column it maps to, or -1 for any augmented column (augmented
    columns are interchangeable missdetection slots)."""
    return tuple(
        int(c) if c < n_real_cols else -1 for c in sol[:n_real_rows])


@pytest.mark.parametrize("traced", [False, True])
def test_murty_real_assignment_block(rng, traced):
    """Murty::setRealAssignmentBlock parity (MurtyAlgorithm.cpp:126-135,
    181-186, 255-262): on a missdetect/clutter-augmented table the k-best
    hypotheses must be distinct IN THE REAL BLOCK, and their scores must
    match brute force reduced to distinct real-block patterns."""
    n, nR, nC, k = 5, 3, 2, 6
    floor = -20.0
    cost = np.full((n, n), floor, np.float32)
    cost[:nR, :nC] = rng.normal(size=(nR, nC)).astype(np.float32) * 2

    if traced:
        sols, scores, valid = jax.jit(
            lambda c, r, cc: murty(c, k, real_rows=r, real_cols=cc)
        )(jnp.asarray(cost), jnp.int32(nR), jnp.int32(nC))
    else:
        sols, scores, valid = murty(jnp.asarray(cost), k,
                                    real_rows=nR, real_cols=nC)
    sols, scores, valid = map(np.asarray, (sols, scores, valid))

    # brute force: best score per distinct real-block pattern
    perms, bf_scores = brute_force_assignments(cost)
    best_by_pattern = {}
    for p, s in zip(perms, bf_scores):
        pat = _real_block_pattern(p, nR, nC)
        if pat not in best_by_pattern or s > best_by_pattern[pat]:
            best_by_pattern[pat] = s
    expected = sorted(best_by_pattern.values(), reverse=True)[:k]

    got_patterns = [
        _real_block_pattern(sols[i], nR, nC) for i in range(k) if valid[i]]
    assert len(got_patterns) == len(set(got_patterns)), (
        "duplicate real-block hypotheses")
    assert valid.sum() == min(k, len(best_by_pattern))
    np.testing.assert_allclose(
        scores[valid], expected[: int(valid.sum())], rtol=1e-4)


def test_murty_real_block_full_dims_matches_unrestricted(rng):
    """real_rows=real_cols=n must behave exactly like plain murty."""
    n, k = 4, 5
    cost = rng.normal(size=(n, n)).astype(np.float32)
    s0 = murty(jnp.asarray(cost), k)
    s1 = murty(jnp.asarray(cost), k, real_rows=n, real_cols=n)
    for a, b in zip(s0, s1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _mh_style_tables(rng, P, n, floor=-20.0):
    """Random MH-FastSLAM-style DA tables: per lane, a random real
    [n_m, n_z] block over a floor (the padded NMZ table shape)."""
    tables = np.full((P, n, n), floor, np.float32)
    n_ms = rng.integers(0, n, size=P).astype(np.int32)
    n_z = int(rng.integers(1, n))
    for p in range(P):
        tables[p, : n_ms[p], :n_z] = (
            rng.normal(size=(n_ms[p], n_z)).astype(np.float32) * 2)
    return jnp.asarray(tables), jnp.asarray(n_ms), n_z


def test_murty_gated_exact_within_budget(rng):
    """With a budget that covers every ambiguous lane, murty_gated must be
    BIT-IDENTICAL to the plain vmapped murty (non-ambiguous lanes are exact
    by the dual-bound certificate; ambiguous lanes run the real thing)."""
    from rfs_slam_tpu.ops.assignment import murty_gated

    P, n, k, window = 12, 6, 3, 3.0
    for _ in range(5):
        tables, n_ms, n_z = _mh_style_tables(rng, P, n)
        plain = jax.vmap(
            lambda t, nr: murty(t, k, real_rows=nr, real_cols=n_z,
                                prune_window=window)
        )(tables, n_ms)
        das, scores, valid, overflow = murty_gated(
            tables, k, n_ms, real_cols=n_z, prune_window=window,
            budget=P - 1, return_overflow=True)
        assert int(overflow) == 0, "budget P-1 should cover all lanes here"
        np.testing.assert_array_equal(np.asarray(das), np.asarray(plain[0]))
        np.testing.assert_array_equal(np.asarray(scores),
                                      np.asarray(plain[1]))
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(plain[2]))


def test_murty_gated_truncation_is_bounded_and_sound(rng):
    """With a small budget, a lane either matches the plain murty exactly or
    is truncated to its (exact) best hypothesis — and the number of
    truncated lanes is bounded by the reported overflow counter."""
    from rfs_slam_tpu.ops.assignment import murty_gated

    P, n, k, window = 16, 6, 3, 6.0
    tables, n_ms, n_z = _mh_style_tables(rng, P, n)
    plain = jax.vmap(
        lambda t, nr: murty(t, k, real_rows=nr, real_cols=n_z,
                            prune_window=window)
    )(tables, n_ms)
    p_das, p_sc, p_va = map(np.asarray, plain)
    das, scores, valid, overflow = murty_gated(
        tables, k, n_ms, real_cols=n_z, prune_window=window,
        budget=2, return_overflow=True)
    das, scores, valid = map(np.asarray, (das, scores, valid))

    n_trunc = 0
    for p in range(P):
        if (np.array_equal(das[p], p_das[p])
                and np.array_equal(scores[p], p_sc[p])
                and np.array_equal(valid[p], p_va[p])):
            continue
        # truncated lane: best hypothesis still exact, others dropped
        n_trunc += 1
        assert valid[p, 0] == p_va[p, 0]
        np.testing.assert_array_equal(das[p, 0], p_das[p, 0])
        np.testing.assert_array_equal(scores[p, 0], p_sc[p, 0])
        assert not valid[p, 1:].any()
    assert n_trunc <= int(overflow)


def test_murty_gated_run_all_paths():
    """budget=None / budget>=P / k=1 fall back to the plain vmapped murty."""
    from rfs_slam_tpu.ops.assignment import murty_gated

    rng = np.random.default_rng(7)
    P, n, k, window = 4, 5, 3, 3.0
    tables, n_ms, n_z = _mh_style_tables(rng, P, n)
    plain = jax.vmap(
        lambda t, nr: murty(t, k, real_rows=nr, real_cols=n_z,
                            prune_window=window)
    )(tables, n_ms)
    for budget in (None, P, P + 5):
        out = murty_gated(tables, k, n_ms, real_cols=n_z,
                          prune_window=window, budget=budget)
        for a, b in zip(out, plain):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
