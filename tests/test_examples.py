"""Smoke tests for the example programs (reference bin/examples parity).

The reference uses its examples as semi-automated oracles (SURVEY.md
section 4); each example here asserts its own validation internally, so the
smoke run doubles as a correctness check.
"""

from rfs_slam_tpu.examples import (
    linear_assignment_lexicographic,
    linear_assignment_murty,
    linear_assignment_partition,
    ospa_error,
    spatial_index,
)


def test_murty_example():
    scores = linear_assignment_murty.main(verbose=False)
    assert len(scores) > 1
    assert scores == sorted(scores, reverse=True)


def test_partition_example():
    row_lab, col_lab, total = linear_assignment_partition.main(verbose=False)
    assert total > 0.0


def test_lexicographic_example():
    perms, total = linear_assignment_lexicographic.main(verbose=False)
    assert total > 0.0


def test_ospa_example():
    ospa_error.main(verbose=False)


def test_spatial_index_example(tmp_path):
    out = tmp_path / "tree.txt"
    counts = spatial_index.main(out_file=str(out), verbose=False)
    assert counts.sum() == 200
    assert out.exists()
