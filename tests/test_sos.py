"""SOS1 branching test (reference: SOS1Handler set-partition branching).

Problem: maximize x0+x1+x2 (min of negation) with x_i in [0,1] and an
SOS1 set {x0, x1, x2} (at most one nonzero): optimum = -1.
Without SOS enforcement the LP optimum would be -3.
"""

import numpy as np
import pytest

from minotaur_tpu.bnb.bnb import BranchAndBound
from minotaur_tpu.ir.functions import Function, LinearFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus


def test_sos1_branching():
    p = Problem("sos1")
    for j in range(3):
        p.new_variable(0.0, 1.0)
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: -1.0, 2: -1.0})))
    p._sos1.append(([1.0, 2.0, 3.0], [0, 1, 2]))
    env = Environment()
    env.set_option("node_batch", 4)
    env.set_option("log_level", 1)
    bab = BranchAndBound(p, env)
    status = bab.solve()
    assert status == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-1.0, abs=1e-6)
    # at most one nonzero in the solution
    assert np.sum(np.abs(bab.best_x) > 1e-6) <= 1
