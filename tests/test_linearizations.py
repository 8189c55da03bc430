"""Root linearization scheme tests.

Reference analogues: Linearizations.{h,cpp} (rs schemes, ESH boundary
points) + AnalyticalCenter.{h,cpp}, wired by QGHandlerAdvance.
"""

import numpy as np
import pytest

from minotaur_tpu.bnb.linearizations import RootLinearizer
from minotaur_tpu.bnb.qg import QGBranchAndBound
from minotaur_tpu.engines.staging import stage_problem
from minotaur_tpu.ir.functions import Function, LinearFunction, \
    QuadraticFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus, VarType

INF = float("inf")


def _disc_problem():
    # x^2 + y^2 <= 4, x integer
    p = Problem("disc")
    p.new_variable(0, 2, VarType.INTEGER)
    p.new_variable(0, 2)
    qf = QuadraticFunction()
    qf.add_term(0, 0, 1.0)
    qf.add_term(1, 1, 1.0)
    p.new_constraint(Function(qf=qf), -INF, 4.0)
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: -1.0})))
    return p


def test_analytic_center_box():
    # pure box: center of [0,2]x[0,4] is (1, 2) (log-barrier center)
    p = Problem("box")
    p.new_variable(0, 2)
    p.new_variable(0, 4)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0})),
                     -INF, 100.0)  # slack row, never binding
    p.new_objective(Function(lf=LinearFunction({0: 1.0})))
    sp = stage_problem(p)
    rl = RootLinearizer(sp)
    xc = rl.analytic_center(sp.vlb, sp.vub)
    assert xc is not None
    assert xc[0] == pytest.approx(1.0, abs=0.15)
    assert xc[1] == pytest.approx(2.0, abs=0.3)


def test_esh_boundary_point():
    sp = stage_problem(_disc_problem())
    rl = RootLinearizer(sp)
    xc = np.array([0.1, 0.1])
    xo = np.array([3.0, 0.1])
    pts, valid = rl.esh_points(xc, xo)
    assert valid[0]
    # boundary of x^2 + y^2 = 4 along the ray: x ~ sqrt(4 - 0.01)
    assert pts[0, 0] == pytest.approx(np.sqrt(4 - 0.01), abs=1e-6)
    assert pts[0, 1] == pytest.approx(0.1, abs=1e-9)


def test_esh_invalid_when_not_violated():
    sp = stage_problem(_disc_problem())
    rl = RootLinearizer(sp)
    pts, valid = rl.esh_points(np.array([0.1, 0.1]),
                               np.array([1.0, 1.0]))  # interior
    assert not valid[0]


@pytest.mark.parametrize("scheme", ["esh", "both", ""])
def test_qg_with_root_schemes(scheme):
    # optimum -1 - sqrt(3) at x=1, y=sqrt(3)
    env = Environment()
    env.set_option("log_level", 1)
    env.set_option("root_linearizations", scheme)
    env.set_option("node_batch", 8)
    bab = QGBranchAndBound(_disc_problem(), env)
    st = bab.solve()
    assert st == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-1.0 - np.sqrt(3.0), abs=1e-5)
    if scheme:
        assert bab.qg_stats.cuts_added >= 2


def _univar_rows_problem():
    """Two UNIVARIATE nonlinear rows (the rs1/rs2 target shape):
    x^2 <= 4, exp(y) <= 5, x integer.  Optimum x=2, y=ln 5."""
    from minotaur_tpu.ir.expr import ExprGraph
    from minotaur_tpu.ops.opcodes import Op
    p = Problem("univar_rows")
    p.new_variable(0, 3, VarType.INTEGER)
    p.new_variable(0, 3)
    qf = QuadraticFunction()
    qf.add_term(0, 0, 1.0)
    p.new_constraint(Function(qf=qf), -INF, 4.0, "sq")
    g = ExprGraph()
    g.set_root(g.node(Op.EXP, g.var(1)))
    p.new_constraint(Function(nlf=g), -INF, 5.0, "expr")
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: -1.0})))
    return p


def test_rs_scheme_point_generators():
    from minotaur_tpu.bnb.linearizations import (RootSchemes,
                                                 _univariate_rows)
    sp = stage_problem(_univar_rows_problem())
    assert len(_univariate_rows(sp)) == 2
    rl = RootLinearizer(sp)
    rs = RootSchemes(rl)
    x0 = np.array([1.0, 1.0])
    p1 = rs.rs1_points(x0, fan=5)
    assert p1.shape == (10, 2)         # 2 rows x 5 abscissae
    # fan spans each variable's range
    assert p1[:5, 0].min() == pytest.approx(0.0)
    assert p1[:5, 0].max() == pytest.approx(3.0)
    p2 = rs.rs2_points(x0, nbh=0.25, count=6)
    assert p2.shape == (6, 2)
    assert np.all(np.abs(p2 - x0[None, :]) <= 0.25 * 3 + 1e-9)


@pytest.mark.slow
@pytest.mark.parametrize("scheme", ["rs1", "rs2", "rs3"])
def test_rs_schemes_add_valid_cuts_and_solve(scheme):
    import math
    env = Environment()
    env.set_option("log_level", 1)
    env.set_option("root_linearizations", scheme)
    env.set_option("node_batch", 4)
    bab = QGBranchAndBound(_univar_rows_problem(), env)
    st = bab.solve()
    assert st == SolveStatus.SOLVED_OPTIMAL
    # optimum: x=2 (x^2<=4, integer), y=ln 5
    assert bab.ub == pytest.approx(-(2.0 + math.log(5.0)), abs=1e-5)
    assert bab.n_cuts > 0              # the scheme actually added cuts
