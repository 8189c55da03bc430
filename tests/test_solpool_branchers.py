"""Solution pool (best-k) + brancher variant tests.

Reference analogues: SolutionPool.{h,cpp} (best-k feasible solutions),
LexicoBrancher / RandomBrancher / MaxFreqBrancher / MaxVioBrancher.
"""

import numpy as np
import pytest

from minotaur_tpu.bnb.bnb import BranchAndBound
from minotaur_tpu.bnb.solpool import SolutionPool
from minotaur_tpu.ir.functions import Function, LinearFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus, VarType

INF = float("inf")


def test_pool_orders_and_caps():
    pool = SolutionPool(3)
    for v in (5.0, 1.0, 3.0, 2.0, 4.0):
        pool.add(np.array([v]), v)
    assert pool.values() == [1.0, 2.0, 3.0]
    assert pool.best_value() == 1.0
    assert pool.best()[1][0] == 1.0
    assert pool.num_added == 4      # the non-improving 4.0 is rejected
    assert pool.best_seen == 1.0


def test_pool_dedup():
    pool = SolutionPool(5)
    x = np.array([1.0, 2.0])
    assert pool.add(x, 7.0)
    assert not pool.add(x.copy(), 7.0)
    assert len(pool) == 1


def _milp():
    # min -2x0 -3x1 - x2 s.t. 3x0+5x1+x2<=7, x0+x1>=1; x0,x1 bin, x2<=4
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
    return p


@pytest.mark.parametrize("rule", ["maxvio", "rel", "lexico", "random",
                                  "maxfreq"])
def test_branchers_reach_same_optimum(rule):
    env = Environment()
    env.set_option("log_level", 1)
    env.set_option("brancher", rule)
    env.set_option("node_batch", 4)
    bab = BranchAndBound(_milp(), env=env)
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-6.0, abs=1e-6)


def test_bnb_fills_solution_pool():
    env = Environment()
    env.set_option("log_level", 1)
    env.set_option("node_batch", 4)
    bab = BranchAndBound(_milp(), env=env)
    bab.solve()
    assert len(bab.sol_pool) >= 1
    assert bab.sol_pool.best_value() == pytest.approx(bab.ub)
    # pooled solutions are feasible and sorted
    vals = bab.sol_pool.values()
    assert vals == sorted(vals)
    for v, x in bab.sol_pool.solutions():
        assert bab.problem.is_feasible(x, atol=1e-5, int_tol=1e-6)
