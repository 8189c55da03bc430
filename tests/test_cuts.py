"""Cover cut generator tests (reference: CoverCutGenerator/KnapCovHandler)."""

import numpy as np
import pytest

from minotaur_tpu.bnb.cuts import find_knapsack_rows, separate_cover_cuts


def test_find_and_separate_cover():
    # 3x0 + 4x1 + 5x2 <= 6, binaries
    A = np.array([[3.0, 4.0, 5.0]])
    clb = np.array([-np.inf])
    cub = np.array([6.0])
    int_mask = np.array([True, True, True])
    vlb = np.zeros(3)
    vub = np.ones(3)
    rows = find_knapsack_rows(A, clb, cub, int_mask, vlb, vub)
    assert len(rows) == 1
    # LP point x = (0.9, 0.9, 0) violates the cover {0, 1}: x0 + x1 <= 1
    cuts = separate_cover_cuts(rows, np.array([0.9, 0.9, 0.0]))
    assert len(cuts) == 1
    vars_, rhs = cuts[0]
    assert rhs == pytest.approx(1.0)
    # cover {0,1} extended with var 2 (a_2=5 >= max cover weight 4)
    assert set(int(v) for v in vars_) == {0, 1, 2}
    # cut is valid for every feasible binary point
    for a in range(2):
        for b in range(2):
            for c in range(2):
                if 3 * a + 4 * b + 5 * c <= 6:
                    assert a + b + c <= rhs + 1e-9


def test_no_cut_when_integral():
    A = np.array([[3.0, 4.0, 5.0]])
    rows = find_knapsack_rows(A, np.array([-np.inf]), np.array([6.0]),
                              np.ones(3, bool), np.zeros(3), np.ones(3))
    assert separate_cover_cuts(rows, np.array([1.0, 0.0, 0.0])) == []


def test_skips_nonknapsack_rows():
    # negative coefficient and ranged rows are not knapsacks
    A = np.array([[3.0, -4.0, 5.0], [1.0, 1.0, 1.0]])
    rows = find_knapsack_rows(A, np.array([-np.inf, 1.0]),
                              np.array([6.0, 2.0]), np.ones(3, bool),
                              np.zeros(3), np.ones(3))
    assert rows == []
