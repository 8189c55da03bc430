"""In-tree multistart node processing (MsBranchAndBound).

Reference analogue: MsProcessor.{h,cpp} (per-node multistart NLP solves,
msbnb_restarts / msbnb_scheme_id) inside MsBnb/MultiStart solvers.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from minotaur_tpu.bnb.multistart import MsBranchAndBound
from minotaur_tpu.ir.expr import ExprGraph
from minotaur_tpu.ir.functions import Function, LinearFunction, \
    QuadraticFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.ops.opcodes import Op
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import VarType


def _wavy_minlp():
    """min sin(3x) + 0.1 x^2 + (y-1)^2,  x in [-3,3], y in {0,1,2}.

    The continuous slice has three local minima; the global one is near
    x = -0.512 with value ~ -0.9732 (+0 at y=1).  A warm start at x=2
    drags a single-start NLP into the x ~ 1.55 basin (value ~ -0.754).
    """
    p = Problem("wavy")
    p.new_variable(-3.0, 3.0)
    p.new_variable(0.0, 2.0, vtype=VarType.INTEGER)
    g = ExprGraph()
    x = g.var(0)
    t = g.node(Op.SIN, g.node(Op.MULT, g.num(3.0), x))
    g.set_root(t)
    qf = QuadraticFunction()
    qf.add_term(0, 0, 0.1)
    qf.add_term(1, 1, 1.0)
    lf = LinearFunction({1: -2.0})
    p.new_objective(Function(lf=lf, qf=qf, nlf=g), const=1.0)
    p.initial_point = np.array([2.0, 1.0])
    return p


def test_msbnb_escapes_local_minimum():
    env = Environment()
    env.set_option("node_batch", 16)
    env.set_option("msbnb_restarts", 8)
    env.set_option("bnb_node_limit", 60)
    env.set_option("bnb_time_limit", 180)
    env.set_option("log_level", 1)
    bab = MsBranchAndBound(_wavy_minlp(), env)
    bab.solve()
    assert bab.best_x is not None
    # global basin reached despite the adversarial warm start
    assert bab.ub <= -0.95
    assert bab.best_x[1] == pytest.approx(1.0, abs=1e-6)
    assert bab.best_x[0] == pytest.approx(-0.512, abs=0.05)
    # lane merging: processed-node count tracks tree nodes, not lanes
    assert bab.stats.nodes_processed <= 60


def test_msbnb_restarts_one_matches_base():
    env = Environment()
    env.set_option("node_batch", 8)
    env.set_option("msbnb_restarts", 1)
    env.set_option("bnb_node_limit", 40)
    env.set_option("bnb_time_limit", 120)
    env.set_option("log_level", 1)
    bab = MsBranchAndBound(_wavy_minlp(), env)
    bab.solve()
    # single-start path still produces a feasible incumbent
    assert bab.best_x is not None and bab.ub < 0.0
