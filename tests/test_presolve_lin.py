"""Linear presolve suite tests.

Reference analogues: LinearHandler's presolve passes — duplicate rows
(dupRows_ LinearHandler.cpp:882), redundant rows, coefficient improvement
for binaries (:600), dual fixing (:786).
"""

import numpy as np
import pytest

from minotaur_tpu.bnb.presolve import Presolver
from minotaur_tpu.engines.staging import stage_problem
from minotaur_tpu.ir.functions import Function, LinearFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus, VarType

INF = float("inf")


def _pre(p):
    sp = stage_problem(p)
    return Presolver(p, sp), sp


def test_duplicate_rows_merge():
    p = Problem("dup")
    p.new_variable(0, 10)
    p.new_variable(0, 10)
    lf = {0: 1.0, 1: 2.0}
    p.new_constraint(Function(lf=LinearFunction(dict(lf))), -INF, 8.0)
    p.new_constraint(Function(lf=LinearFunction(dict(lf))), 1.0, INF)
    p.new_objective(Function(lf=LinearFunction({0: 1.0})))
    pre, sp = _pre(p)
    st, vlb, vub = pre.linear_presolve(sp.vlb.copy(), sp.vub.copy())
    assert st == SolveStatus.FINISHED
    assert pre.stats.dup_rows == 1
    # merged into one two-sided row, the other vacated
    merged = [(sp.clb[i], sp.cub[i]) for i in range(2)]
    assert (1.0, 8.0) in merged
    assert (-INF, INF) in merged


def test_duplicate_rows_infeasible():
    p = Problem("dupinf")
    p.new_variable(0, 10)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0})), -INF, 2.0)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0})), 5.0, INF)
    p.new_objective(Function(lf=LinearFunction({0: 1.0})))
    pre, sp = _pre(p)
    st, _, _ = pre.linear_presolve(sp.vlb.copy(), sp.vub.copy())
    assert st == SolveStatus.SOLVED_INFEASIBLE


def test_redundant_row_vacated():
    p = Problem("red")
    p.new_variable(0, 1)
    p.new_variable(0, 1)
    # x + y <= 5 can never bind
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0})),
                     -INF, 5.0)
    p.new_objective(Function(lf=LinearFunction({0: 1.0, 1: 1.0})))
    pre, sp = _pre(p)
    st, _, _ = pre.linear_presolve(sp.vlb.copy(), sp.vub.copy())
    assert pre.stats.redundant_rows == 1
    assert sp.cub[0] == INF and sp.clb[0] == -INF


def test_coefficient_improvement():
    # 3x + 5y <= 7, x in [0,1], y binary: improves to 3x + y <= 3
    p = Problem("coef")
    p.new_variable(0, 1)
    p.new_variable(0, 1, VarType.BINARY)
    p.new_constraint(Function(lf=LinearFunction({0: 3.0, 1: 5.0})),
                     -INF, 7.0)
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: -1.0})))
    pre, sp = _pre(p)
    st, _, _ = pre.linear_presolve(sp.vlb.copy(), sp.vub.copy())
    assert pre.stats.coefs_improved == 1
    assert sp.A[0, 1] == pytest.approx(1.0)
    assert sp.cub[0] == pytest.approx(3.0)
    # integer-feasible set unchanged: (x, y=1) needs 3x <= 2 both ways
    for x in np.linspace(0, 1, 7):
        for y in (0.0, 1.0):
            old = 3 * x + 5 * y <= 7 + 1e-12
            new = 3 * x + y <= 3 + 1e-12
            assert old == new


def test_coefficient_improvement_geq_row():
    # 3x + 5y >= 3 with y binary: -3x - 5y <= -3; a=-5, U_rest(-3x)=0,
    # b=-3: x_j=1 slack (0 <= -3+5), b < U_rest -> a' = b - U = -3
    # row becomes 3x + 3y >= 3
    p = Problem("coefg")
    p.new_variable(0, 1)
    p.new_variable(0, 1, VarType.BINARY)
    p.new_constraint(Function(lf=LinearFunction({0: 3.0, 1: 5.0})),
                     3.0, INF)
    p.new_objective(Function(lf=LinearFunction({0: 1.0, 1: 1.0})))
    pre, sp = _pre(p)
    pre.linear_presolve(sp.vlb.copy(), sp.vub.copy())
    assert pre.stats.coefs_improved == 1
    assert sp.A[0, 1] == pytest.approx(3.0)
    assert sp.clb[0] == pytest.approx(3.0)


def test_dual_fixing():
    # min x + 2z  s.t. x + y >= 1, z <= 5; z only pushed DOWN by its row
    # -> fix z at lower bound; x is pushed up by the >= row -> kept
    p = Problem("dfix")
    p.new_variable(0, 10)          # x
    p.new_variable(0, 10)          # y
    p.new_variable(0, 10)          # z
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0})),
                     1.0, INF)
    p.new_constraint(Function(lf=LinearFunction({2: 1.0})), -INF, 5.0)
    p.new_objective(Function(lf=LinearFunction({0: 1.0, 2: 2.0})))
    pre, sp = _pre(p)
    st, vlb, vub = pre.linear_presolve(sp.vlb.copy(), sp.vub.copy())
    assert vub[2] == pytest.approx(0.0)          # z fixed to 0
    assert vub[0] == pytest.approx(10.0)         # x untouched
    # y has c=0 and is only pushed up -> not fixed at lb; but can be
    # fixed at ub? pushing y up is free (c_y = 0, no upper pressure)
    assert pre.stats.dual_fixed >= 1


def test_presolve_preserves_milp_optimum():
    # small MILP solved with and without linear presolve
    from minotaur_tpu.bnb.bnb import BranchAndBound
    vals = {}
    for lin in (True, False):
        p = Problem("milp")
        p.new_variable(0, 1, VarType.BINARY)
        p.new_variable(0, 1, VarType.BINARY)
        p.new_variable(0, 4)
        p.new_constraint(Function(lf=LinearFunction(
            {0: 3.0, 1: 5.0, 2: 1.0})), -INF, 7.0)
        p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0})),
                         1.0, INF)
        p.new_objective(Function(lf=LinearFunction(
            {0: -2.0, 1: -3.0, 2: -1.0})))
        env = Environment()
        env.set_option("log_level", 1)
        env.set_option("lin_presolve", lin)
        bab = BranchAndBound(p, env=env)
        assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
        vals[lin] = bab.ub
    assert vals[True] == pytest.approx(vals[False], abs=1e-6)


def test_singleton_rows():
    """A one-nonzero row folds into variable bounds and vacates
    (reference: LinearHandler singleton rows, LinearHandler.cpp:362)."""
    p = Problem("singleton")
    p.new_variable(0, 10)
    p.new_variable(0, 10, VarType.INTEGER)
    # 2*x0 in [1, 6]  ->  x0 in [0.5, 3]
    p.new_constraint(Function(lf=LinearFunction({0: 2.0})), 1.0, 6.0)
    # -3*x1 <= -4     ->  x1 >= 4/3  -> integer rounding: x1 >= 2
    p.new_constraint(Function(lf=LinearFunction({1: -3.0})), -INF, -4.0)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0})),
                     -INF, 9.0)
    p.new_objective(Function(lf=LinearFunction({0: 1.0, 1: 1.0})))
    pre, sp = _pre(p)
    st, vlb, vub = pre.linear_presolve(sp.vlb.copy(), sp.vub.copy())
    assert st == SolveStatus.FINISHED
    assert pre.stats.singleton_rows == 2
    # singleton fold gives x0 in [0.5, 3]; the later dual-fixing pass
    # legitimately pins this min-c column at its new lower bound
    assert vlb[0] == pytest.approx(0.5) and vub[0] <= 3.0 + 1e-9
    assert vlb[1] == pytest.approx(2.0)
    # both singleton rows vacated, the 2-var row kept
    assert np.isinf(sp.clb[0]) and np.isinf(sp.cub[0])
    assert sp.cub[2] == pytest.approx(9.0)


def test_singleton_row_infeasible():
    p = Problem("singleton-inf")
    p.new_variable(0, 1, VarType.INTEGER)
    # 2*x0 in [0.5, 1.2] -> x0 in [0.25, 0.6] -> integer: empty
    p.new_constraint(Function(lf=LinearFunction({0: 2.0})), 0.5, 1.2)
    p.new_objective(Function(lf=LinearFunction({0: 1.0})))
    pre, sp = _pre(p)
    st, _, _ = pre.linear_presolve(sp.vlb.copy(), sp.vub.copy())
    assert st == SolveStatus.SOLVED_INFEASIBLE
