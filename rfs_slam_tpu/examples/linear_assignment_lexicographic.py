"""Lexicographic enumeration of data-association hypotheses.

Equivalent of the reference's ``linearAssignment_LexicographicOrdering``
example (src/examples/linearAssignment_LexicographicOrdering.cpp, driving
PermutationLexicographic.hpp:44-79): enumerate every landmark->measurement
assignment including missed detections (landmark -> n_z) and clutter
(unclaimed measurements), in lexicographic order, and sum the RFS
association likelihood over all hypotheses — the exact-enumeration path the
RB-PHD likelihood takes for small partitions (RBPHDFilter.hpp:961-988).
"""

from __future__ import annotations

import numpy as np

from rfs_slam_tpu.ops.assignment import permutations_lexicographic


def main(n_m: int = 3, n_z: int = 2, seed: int = 3, verbose: bool = True):
    perms = permutations_lexicographic(n_m, n_z)
    if verbose:
        print(f"{n_m} landmarks, {n_z} measurements "
              f"(index {n_z} = missed detection)")
        print(f"{len(perms)} hypotheses, lexicographic:")
        for p in perms:
            print("  " + " ".join(str(int(x)) for x in p))

    # sanity: count matches sum_k C(n_m, k) * P(n_z, k)
    import math

    expect = sum(
        math.comb(n_m, k) * math.perm(n_z, k)
        for k in range(min(n_m, n_z) + 1)
    )
    assert len(perms) == expect, (len(perms), expect)

    # weight each hypothesis with a random likelihood table + Pd
    rng = np.random.default_rng(seed)
    lik = rng.uniform(size=(n_m, n_z))
    pd = 0.95
    clutter = 1e-3
    total = 0.0
    for p in perms:
        w = 1.0
        for m, z in enumerate(p):
            w *= pd * lik[m, z] if z < n_z else (1.0 - pd)
        n_clutter = n_z - int(np.sum(p < n_z))
        w *= clutter**n_clutter
        total += w
    if verbose:
        print(f"\nRFS association-likelihood sum over all "
              f"{len(perms)} hypotheses: {total:.6e}")
    return perms, total


if __name__ == "__main__":
    main()
