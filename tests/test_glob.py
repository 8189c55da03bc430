"""Global (spatial B&B) pipeline tests.

Reference analogues: QuadHandler's secant/McCormick relaxations and the
Glob driver (convexity detection + fwd2QG).  Optima below are analytic.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from minotaur_tpu.glob.glob_bnb import GlobBranchAndBound
from minotaur_tpu.glob.transformer import is_convex_quadratic, transform
from minotaur_tpu.ir.functions import Function, LinearFunction, \
    QuadraticFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus, VarType

from conftest import REF_INSTANCES


def _env(batch=16, nodes=3000):
    env = Environment()
    env.set_option("node_batch", batch)
    env.set_option("bnb_node_limit", nodes)
    env.set_option("bnb_time_limit", 120)
    env.set_option("log_level", 1)
    return env


def bilinear_problem():
    # min -x*y s.t. x + y <= 4, x,y in [0,4]; optimum -4 at (2,2)
    p = Problem("bilin")
    p.new_variable(0, 4)
    p.new_variable(0, 4)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0})),
                     -np.inf, 4.0)
    qf = QuadraticFunction()
    qf.add_term(0, 1, -1.0)
    p.new_objective(Function(qf=qf))
    return p


def test_transformer_dedup():
    p = bilinear_problem()
    # same term in a constraint reuses the aux var (YEq dedup)
    qf = QuadraticFunction()
    qf.add_term(0, 1, 2.0)
    p.new_constraint(Function(qf=qf), -np.inf, 10.0)
    gs = transform(p)
    assert gs.n_y == 1
    assert gs.A.shape == (2, 3)
    # aux bounds = interval product [0,16]
    assert gs.vlb[2] == pytest.approx(0.0)
    assert gs.vub[2] == pytest.approx(16.0)


def test_bilinear_global_optimum():
    bab = GlobBranchAndBound(bilinear_problem(), _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-4.0, abs=1e-5)


def test_concave_square():
    # min -(x-1)^2 = -x^2 + 2x - 1 over [0,3]: optimum -4 at x=3
    p = Problem("concave")
    p.new_variable(0, 3)
    qf = QuadraticFunction()
    qf.add_term(0, 0, -1.0)
    p.new_objective(Function(lf=LinearFunction({0: 2.0}), qf=qf), const=-1.0)
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-4.0, abs=1e-6)
    assert bab.best_x[0] == pytest.approx(3.0, abs=1e-6)


def test_nonconvex_miqcqp():
    # min -xy - z s.t. x+y+z <= 5, x^2+y^2 <= 8, z int in [0,3]
    # optimum -5 at (2, 2, 1)
    p = Problem("miq")
    p.new_variable(0, 3)
    p.new_variable(0, 3)
    p.new_variable(0, 3, VarType.INTEGER)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0, 2: 1.0})),
                     -np.inf, 5.0)
    q2 = QuadraticFunction()
    q2.add_term(0, 0, 1.0)
    q2.add_term(1, 1, 1.0)
    p.new_constraint(Function(qf=q2), -np.inf, 8.0)
    qo = QuadraticFunction()
    qo.add_term(0, 1, -1.0)
    p.new_objective(Function(lf=LinearFunction({2: -1.0}), qf=qo))
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-5.0, abs=1e-5)


def test_convexity_detection():
    from minotaur_tpu.io.nl_reader import read_nl
    hs021 = read_nl(os.path.join(REF_INSTANCES, "hs021.nl"))
    assert is_convex_quadratic(hs021)       # PSD objective
    assert not is_convex_quadratic(bilinear_problem())  # indefinite


def test_mglob_cli_forwards_convex():
    from minotaur_tpu.solvers.mglob import main
    rc = main([os.path.join(REF_INSTANCES, "hs021.nl"), "--log_level", "1"])
    assert rc == 0


def test_separable_constraint_splits_into_terms():
    """TransSep parity (reference TransSep.cpp separability splitting):
    an additively separable nonlinear constraint x^2 + sin(y) + exp(z)
    <= b is split by the transformer walk into INDEPENDENT per-term aux
    columns — one bilinear square and two univariate terms sharing one
    linear row — so each term is relaxed by its own envelope instead of
    one joint relaxation of the whole body.  The per-term interval
    bounds on the aux columns prove the split happened."""
    from minotaur_tpu.ir.expr import ExprGraph
    from minotaur_tpu.ops.opcodes import Op

    p = Problem("sep")
    p.new_variable(0.0, 2.0)    # x
    p.new_variable(0.0, np.pi)  # y
    p.new_variable(0.0, 1.0)    # z
    g = ExprGraph()
    g.set_root(g.sum_list([
        g.node(Op.SQR, g.var(0)),
        g.node(Op.SIN, g.var(1)),
        g.node(Op.EXP, g.var(2))]))
    p.new_constraint(Function(nlf=g), -np.inf, 4.0)
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: -0.1,
                                                2: -0.1})))
    gs = transform(p)
    # one square term + two univariate terms, separately relaxed
    assert gs.n_y == 1 and gs.n_u == 2
    aux = gs.A[0][gs.n_x:]
    assert np.count_nonzero(aux) == 3       # all three terms in one row
    # per-term interval bounds (split semantics): x^2 in [0,4],
    # sin(y) in [0,1], exp(z) in [1,e]
    lo, hi = gs.vlb[gs.n_x:], gs.vub[gs.n_x:]
    pairs = sorted(zip(lo, hi))
    assert pairs[0] == pytest.approx((0.0, 1.0))            # sin
    assert pairs[1] == pytest.approx((0.0, 4.0))            # x^2
    assert pairs[2] == pytest.approx((1.0, np.e), abs=1e-9)  # exp
    # and the glob driver solves the separable model to the analytic
    # optimum: maximize x + 0.1y + 0.1z with x^2 <= 4 - sin(y) - exp(z);
    # the corner y=pi (sin=0) and z=0 gives x = sqrt(3), so
    # obj = -(sqrt(3) + 0.1*pi)
    bab = GlobBranchAndBound(p, _env())
    st = bab.solve()
    assert st == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-(np.sqrt(3.0) + 0.1 * np.pi),
                                   abs=1e-4)
