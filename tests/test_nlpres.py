"""NlPresHandler-depth tests: quadratic-cone reformulation
(NlPresHandler.cpp:1135) and nonlinear coefficient improvement (:212),
each in the debug_sol-oracle style.
"""

import numpy as np
import pytest

from minotaur_tpu.ir.expr import ExprGraph
from minotaur_tpu.ir.functions import Function, LinearFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.ops.opcodes import Op
from minotaur_tpu.utils.types import VarType

INF = float("inf")


def _sos_problem(a0=-8.0, K=1.0):
    # x1^2 + x2^2 + a0*z <= K, x in [-2,2], z binary
    p = Problem("cone")
    p.new_variable(-2, 2)
    p.new_variable(-2, 2)
    p.new_variable(0, 1, VarType.BINARY)
    g = ExprGraph()
    g.set_root(g.node(Op.PLUS, g.node(Op.SQR, g.var(0)),
                      g.node(Op.SQR, g.var(1))))
    p.new_constraint(Function(lf=LinearFunction({2: a0}), nlf=g),
                     -INF, K)
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: -1.0,
                                                2: 2.0})))
    return p


def test_quad_cone_reform_rewrites_and_preserves_integer_set():
    from minotaur_tpu.bnb.nlpres import quad_cone_reform
    p = _sos_problem()
    p.debug_sol = np.array([0.5, 0.5, 0.0])   # feasible: 0.5 <= 1
    n = quad_cone_reform(p)
    assert n == 1
    con = p.cons[0]
    # new bounds: ub = sqrt(K + eps)
    assert con.ub == pytest.approx(np.sqrt(1 + 1e-4), abs=1e-12)
    # integer-feasible set preserved on a grid at z in {0, 1}
    for z in (0.0, 1.0):
        for x1 in np.linspace(-2, 2, 9):
            for x2 in np.linspace(-2, 2, 9):
                old_ok = x1 * x1 + x2 * x2 - 8.0 * z <= 1.0 + 1e-7
                v = con.fun.eval(np.array([x1, x2, z]))
                new_ok = v <= con.ub + 1e-3   # eps smoothing slack
                assert old_ok == new_ok, (z, x1, x2)


def test_quad_cone_reform_tightens_relaxation():
    from minotaur_tpu.bnb.nlpres import quad_cone_reform
    p = _sos_problem()
    quad_cone_reform(p)
    con = p.cons[0]
    # fractional-z point feasible for the ORIGINAL big-M row
    # (4 - 8*0.4 = 0.8 <= 1) but cut by the cone form
    v = con.fun.eval(np.array([2.0, 0.0, 0.4]))
    assert v > con.ub + 1e-3


def test_quad_cone_reform_skips_non_sos():
    from minotaur_tpu.bnb.nlpres import quad_cone_reform
    p = Problem("notsos")
    p.new_variable(0, 2)
    p.new_variable(0, 1, VarType.BINARY)
    g = ExprGraph()
    g.set_root(g.node(Op.SQRT, g.var(0)))    # not a sum of squares
    p.new_constraint(Function(lf=LinearFunction({1: -3.0}), nlf=g),
                     -INF, 1.0)
    assert quad_cone_reform(p) == 0


def test_nl_coef_improve_tightens_bigM():
    # x0^2 + 5.5 z <= 6 with x0 in [0,1]: sup(body|z=0) = 1, so the
    # row tightens to x0^2 + 0.5 z <= 1 (z=1 case identical: x0^2<=0.5)
    from minotaur_tpu.bnb.presolve import Presolver
    from minotaur_tpu.engines.staging import stage_problem
    p = Problem("nlcoef")
    p.new_variable(0, 1)
    p.new_variable(0, 1, VarType.BINARY)
    g = ExprGraph()
    g.set_root(g.node(Op.SQR, g.var(0)))
    p.new_constraint(Function(lf=LinearFunction({1: 5.5}), nlf=g),
                     -INF, 6.0)
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: -1.0})))
    p.debug_sol = np.array([0.5, 0.0])
    sp = stage_problem(p)
    pre = Presolver(p, sp)
    r = int(sp.nl_rows[0])
    pre.nl_coef_improve(sp.vlb.copy(), sp.vub.copy())
    assert pre.stats.coefs_improved == 1
    assert sp.A[r, 1] == pytest.approx(0.5, abs=1e-9)
    assert sp.cub[r] == pytest.approx(1.0, abs=1e-9)
    # infeasible point stays infeasible under the tightened row
    assert 0.9 ** 2 + sp.A[r, 1] * 1.0 > sp.cub[r]


def test_nl_coef_improve_lb_side():
    # -x0^2 - 5.5 z >= -6  (lb side mirror): inf(body|z=0) = -1
    from minotaur_tpu.bnb.presolve import Presolver
    from minotaur_tpu.engines.staging import stage_problem
    p = Problem("nlcoef_lb")
    p.new_variable(0, 1)
    p.new_variable(0, 1, VarType.BINARY)
    g = ExprGraph()
    g.set_root(g.node(Op.MULT, g.num(-1.0), g.node(Op.SQR, g.var(0))))
    p.new_constraint(Function(lf=LinearFunction({1: -5.5}), nlf=g),
                     -6.0, INF)
    p.new_objective(Function(lf=LinearFunction({0: 1.0})))
    p.debug_sol = np.array([0.5, 0.0])
    sp = stage_problem(p)
    pre = Presolver(p, sp)
    r = int(sp.nl_rows[0])
    pre.nl_coef_improve(sp.vlb.copy(), sp.vub.copy())
    assert pre.stats.coefs_improved == 1
    assert sp.A[r, 1] == pytest.approx(-0.5, abs=1e-9)
    assert sp.clb[r] == pytest.approx(-1.0, abs=1e-9)


def test_quad_cone_solver_end_to_end():
    # solving the cone-reformed MINLP gives the same optimum as the
    # original big-M model
    from minotaur_tpu.bnb.bnb import BranchAndBound
    from minotaur_tpu.utils.environment import Environment

    def solve(nl_presolve):
        p = _sos_problem()
        env = Environment()
        env.set_option("log_level", 1)
        env.set_option("nl_presolve", 1 if nl_presolve else 0)
        env.set_option("node_batch", 4)
        env.set_option("bnb_node_limit", 200)
        env.set_option("bnb_time_limit", 120)
        bab = BranchAndBound(p, env)
        bab.solve()
        return bab.ub

    u1 = solve(True)
    u0 = solve(False)
    assert u1 == pytest.approx(u0, abs=1e-4)
