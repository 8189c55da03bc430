"""Multi-tree Outer Approximation tests (reference: OAHandler/OA.cpp)."""

import numpy as np
import pytest

from minotaur_tpu.bnb.oa import OABranchAndBound
from minotaur_tpu.ir.functions import Function, LinearFunction, \
    QuadraticFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus, VarType


def test_oa_convex_miqp():
    # min x^2 + y^2 s.t. x + y >= 3.7, y int: optimum 6.89 at (1.7, 2)
    p = Problem("convminlp")
    p.new_variable(0, 10)
    p.new_variable(0, 10, VarType.INTEGER)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0})),
                     3.7, np.inf)
    qo = QuadraticFunction()
    qo.add_term(0, 0, 1.0)
    qo.add_term(1, 1, 1.0)
    p.new_objective(Function(qf=qo))
    env = Environment()
    env.set_option("node_batch", 8)
    env.set_option("log_level", 1)
    bab = OABranchAndBound(p, env)
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(6.89, abs=1e-6)
    assert bab.best_x[1] == pytest.approx(2.0)
    assert bab.oa_stats.major_iters <= 10
    # MIP-start injection (reference CplexMILPEngine MIP starts): once
    # an incumbent exists, every later master receives it as a feasible
    # master-space solution
    if bab.oa_stats.major_iters > 1:
        assert bab.oa_stats.mip_starts >= 1


def test_oa_mip_start_lifts_incumbent_to_master_space():
    from minotaur_tpu.bnb.oa import _MasterMILP
    p = Problem("convminlp2")
    p.new_variable(0, 10)
    p.new_variable(0, 10, VarType.INTEGER)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0})),
                     3.7, np.inf)
    qo = QuadraticFunction({(0, 0): 1.0, (1, 1): 1.0})
    p.new_objective(Function(qf=qo))
    env = Environment()
    env.set_option("node_batch", 4)
    env.set_option("log_level", 1)
    oa = OABranchAndBound(p, env)
    # plant an incumbent, then build a master: the start must be a
    # feasible master-space point with eta at the true objective
    x_inc = np.array([1.7, 2.0])
    oa._accept_incumbent(x_inc, float(p.eval_objective(x_inc)))
    master = _MasterMILP(oa)
    assert master.best_x is not None
    assert master.ub == pytest.approx(oa.ub)
    assert master.best_x[:2] == pytest.approx(x_inc)
    if oa.has_eta:
        assert master.best_x[oa.sp_orig.n] == pytest.approx(
            oa.ub - oa.sp_orig.obj_const)
    assert oa.oa_stats.mip_starts == 1
