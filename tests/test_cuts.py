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


def test_lgci_valid_and_stronger():
    """GNS lifted GUB cover cuts (reference LGCIGenerator.cpp:368): brute
    force validity over all binary points feasible for knapsack+GUBs, and
    the lifted cut must dominate the plain cover at the fractional point."""
    from minotaur_tpu.bnb.cuts import find_gub_rows, separate_lgci_cuts
    import itertools

    rng = np.random.default_rng(7)
    for trial in range(30):
        nv = 8
        a = rng.integers(2, 9, nv).astype(float)
        b = float(a.sum() * rng.uniform(0.35, 0.6))
        A = np.zeros((3, nv))
        A[0] = a
        # two disjoint GUBs over subsets
        A[1, [0, 1, 2]] = 1.0
        A[2, [4, 5]] = 1.0
        clb = np.array([-np.inf] * 3)
        cub = np.array([b, 1.0, 1.0])
        im = np.ones(nv, bool)
        vlb, vub = np.zeros(nv), np.ones(nv)
        knaps = find_knapsack_rows(A, clb, cub, im, vlb, vub)
        gubs = find_gub_rows(A, clb, cub, im, vlb, vub)
        assert len(gubs) == 2
        x = rng.uniform(0, 1, nv)
        cuts = separate_lgci_cuts(knaps, gubs, x, max_cuts=4)
        for vars_, coefs, rhs in cuts:
            # violated at x by construction
            assert coefs @ x[vars_] > rhs + 1e-5
            # valid for every feasible binary point
            for pt in itertools.product([0, 1], repeat=nv):
                pt = np.array(pt, float)
                if a @ pt <= b + 1e-9 and pt[[0, 1, 2]].sum() <= 1 \
                        and pt[[4, 5]].sum() <= 1:
                    assert coefs @ pt[vars_] <= rhs + 1e-9, \
                        (trial, a, b, coefs, rhs, pt)


def test_lgci_lifts_above_plain_cover():
    # knapsack 3x1+3x2+3x3+5x4 <= 6: cover {1,2,3} -> x1+x2+x3 <= 2;
    # lifting x4 (budget 1, no cover item fits) gives alpha = 2
    from minotaur_tpu.bnb.cuts import separate_lgci_cuts
    A = np.array([[3.0, 3.0, 3.0, 5.0]])
    rows = find_knapsack_rows(A, np.array([-np.inf]), np.array([6.0]),
                              np.ones(4, bool), np.zeros(4), np.ones(4))
    x = np.array([0.9, 0.9, 0.9, 0.4])
    cuts = separate_lgci_cuts(rows, [], x)
    assert cuts
    vars_, coefs, rhs = cuts[0]
    got = {int(v): float(c) for v, c in zip(vars_, coefs)}
    assert rhs == 2.0 and got[0] == 1 and got[1] == 1 and got[2] == 1
    assert got[3] == 2.0


def test_nl_rows_never_knapsack_or_gub():
    """Regression: a row with a nonlinear part must never feed the cover /
    LGCI / partition generators — its linear slice alone does not bound
    the row, so 'covers' derived from it cut off feasible points (this
    once pruned feasible tls4 children as infeasible)."""
    from minotaur_tpu.bnb.cuts import find_gub_rows
    from minotaur_tpu.bnb.heuristics import find_partition_rows

    # row 0: x0 + x1 + g(x) <= 1  (nonlinear -> must be skipped)
    # row 1: 3x0 + 4x1 + 5x2 <= 6 (pure linear knapsack -> kept)
    A = np.array([[1.0, 1.0, 0.0], [3.0, 4.0, 5.0]])
    clb = np.array([-np.inf, -np.inf])
    cub = np.array([1.0, 6.0])
    int_mask = np.ones(3, bool)
    vlb, vub = np.zeros(3), np.ones(3)
    nl = np.array([0], np.int32)

    knap = find_knapsack_rows(A, clb, cub, int_mask, vlb, vub, nl_rows=nl)
    assert [row[0] for row in knap] == [1]
    gubs = find_gub_rows(A, clb, cub, int_mask, vlb, vub, nl_rows=nl)
    assert gubs == []

    # partition: x0 + x1 == 1 with a nonlinear part is NOT a partition row
    A2 = np.array([[1.0, 1.0, 0.0]])
    eq = np.array([1.0])
    assert find_partition_rows(A2, eq, eq, int_mask, nl_rows=nl) == []
    assert len(find_partition_rows(A2, eq, eq, int_mask)) == 1
