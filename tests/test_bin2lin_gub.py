"""bin2lin exact linearization + GUB detection + extended cover tests.

Reference analogues: NlPresHandler::bin2Lin (NlPresHandler.cpp:424),
ProbStructure GUB detection, CoverCutGenerator cover extension.
"""

import numpy as np
import pytest

from minotaur_tpu.bnb.bin2lin import binary_products_to_linear
from minotaur_tpu.bnb.cuts import find_gub_rows, find_knapsack_rows, \
    separate_cover_cuts
from minotaur_tpu.ir.functions import Function, LinearFunction, \
    QuadraticFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus, VarType

INF = float("inf")


def _miqp():
    # min -x0 - x1 - 2 x0 x1 + 0.5 x2 - x2 x0
    # s.t. x0 + x1 + x2 <= 3.5, x0,x1 bin, x2 in [0, 2]
    # optimum: x0=x1=1, x2 refuses? coef on x2: 0.5 - x0 = -0.5 -> x2=1.5
    # value: -1 -1 -2 + 0.75 - 1.5 = -4.75
    p = Problem("miqp")
    p.new_variable(0, 1, VarType.BINARY)
    p.new_variable(0, 1, VarType.BINARY)
    p.new_variable(0, 2)
    p.new_constraint(Function(lf=LinearFunction(
        {0: 1.0, 1: 1.0, 2: 1.0})), -INF, 3.5)
    qf = QuadraticFunction()
    qf.add_term(0, 1, -2.0)
    qf.add_term(0, 2, -1.0)
    p.new_objective(Function(lf=LinearFunction(
        {0: -1.0, 1: -1.0, 2: 0.5}), qf=qf))
    return p


def test_bin2lin_reformulation_shape():
    p = _miqp()
    res = binary_products_to_linear(p)
    assert res is not None
    milp, n_orig = res
    assert n_orig == 3
    assert milp.n_vars == 5                 # two product auxiliaries
    assert milp.n_cons == 1 + 3 + 4         # orig + binbin + bincont rows
    # every function is now linear
    assert all(c.fun.qf is None or not len(c.fun.qf) for c in milp.cons)
    assert milp.obj.fun.qf is None or not len(milp.obj.fun.qf)


def test_bin2lin_equivalence_on_grid():
    p = _miqp()
    milp, n_orig = binary_products_to_linear(p)
    # for every binary assignment + x2 sample, optimal aux values keep
    # objective equal and rows feasible
    for x0 in (0.0, 1.0):
        for x1 in (0.0, 1.0):
            for x2 in (0.0, 0.7, 2.0):
                x = np.array([x0, x1, x2])
                if not p.is_feasible(x, atol=1e-9, int_tol=1e-9):
                    continue
                z = np.array([x0, x1, x2, x0 * x1, x0 * x2])
                assert milp.is_feasible(z, atol=1e-7, int_tol=1e-9)
                assert milp.eval_objective(z) == pytest.approx(
                    p.eval_objective(x), abs=1e-9)


def test_bin2lin_solver_end_to_end():
    from minotaur_tpu.bnb.bnb import BranchAndBound
    p = _miqp()
    milp, n_orig = binary_products_to_linear(p)
    env = Environment()
    env.set_option("log_level", 1)
    env.set_option("node_batch", 4)
    bab = BranchAndBound(milp, env=env)
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-4.75, abs=1e-5)
    # and matches solving the MIQP directly
    bab2 = BranchAndBound(_miqp(), env=Environment())
    bab2.env.set_option("log_level", 1)
    bab2.solve()
    assert bab2.ub == pytest.approx(bab.ub, abs=1e-5)


def test_bin2lin_rejects_cont_products():
    p = Problem("cc")
    p.new_variable(0, 1)
    p.new_variable(0, 1)
    qf = QuadraticFunction()
    qf.add_term(0, 1, 1.0)
    p.new_objective(Function(qf=qf))
    assert binary_products_to_linear(p) is None


def test_gub_detection():
    A = np.array([[1.0, 1.0, 1.0, 0.0],
                  [2.0, 1.0, 0.0, 0.0],
                  [1.0, 0.0, 0.0, 1.0]])
    clb = np.array([-INF, -INF, -INF])
    cub = np.array([1.0, 5.0, 1.0])
    int_mask = np.array([True, True, True, False])
    vlb = np.zeros(4)
    vub = np.ones(4)
    gubs = find_gub_rows(A, clb, cub, int_mask, vlb, vub)
    # row 0 is a GUB over binaries; row 2 touches a continuous var
    assert len(gubs) == 1
    assert gubs[0][0] == 0
    assert list(gubs[0][1]) == [0, 1, 2]


def test_extended_cover_dominates():
    # knapsack 3a + 3b + 3c + 5d <= 6: cover {a,b,c} any two -> e.g.
    # minimal cover {a,b,c}? 3+3=6 not >6; {a,b,c}: 9>6 minimal? dropping
    # one leaves 6 (not > b) -> minimal.  d has a_d=5 >= 3 -> extended.
    A = np.array([[3.0, 3.0, 3.0, 5.0]])
    clb = np.array([-INF])
    cub = np.array([6.0])
    int_mask = np.ones(4, dtype=bool)
    vlb = np.zeros(4)
    vub = np.ones(4)
    rows = find_knapsack_rows(A, clb, cub, int_mask, vlb, vub)
    x = np.array([0.9, 0.9, 0.9, 0.0])
    cuts = separate_cover_cuts(rows, x, extend=True)
    assert cuts
    members, rhs = cuts[0]
    assert rhs == 2.0
    assert 3 in list(members)          # d lifted into the extended cover
    # validity: every feasible binary point satisfies the cut
    for m in range(16):
        z = np.array([(m >> k) & 1 for k in range(4)], dtype=float)
        if A[0] @ z <= 6.0 + 1e-9:
            assert z[members].sum() <= rhs + 1e-9
