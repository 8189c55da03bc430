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
