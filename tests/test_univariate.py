"""General factorable reformulation + univariate envelope tests.

Reference analogues: SimpleTransformer::recursRef_ (aux vars for |x|,
trig, powers), kPowHandler (y=x^k), CxUnivarHandler (secant/tangent
envelopes for univariate y=f(x)).  Optima below are analytic.
"""

import math

import numpy as np
import pytest

from minotaur_tpu.glob.glob_bnb import GlobBranchAndBound
from minotaur_tpu.glob.transformer import transform
from minotaur_tpu.glob.univariate import term_meta, uni_range_np
from minotaur_tpu.ir.expr import ExprGraph
from minotaur_tpu.ir.functions import Function, LinearFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.ops.opcodes import Op
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus

INF = float("inf")


def _env(batch=16, nodes=4000):
    env = Environment()
    env.set_option("node_batch", batch)
    env.set_option("bnb_node_limit", nodes)
    env.set_option("bnb_time_limit", 120)
    env.set_option("log_level", 1)
    return env


def _nl_obj(p, build, lf=None, const=0.0):
    g = ExprGraph()
    g.set_root(build(g))
    p.new_objective(Function(lf=lf, nlf=g), const=const)


# ------------------------------------------------------------- unit level
def test_uni_range_golden():
    assert uni_range_np(int(Op.EXP), 0.0, 0.0, 1.0) == \
        pytest.approx((1.0, math.e))
    assert uni_range_np(int(Op.LOG), 0.0, -1.0, math.e)[1] == \
        pytest.approx(1.0)
    # sin over [0, pi]: peak at pi/2 inside -> hi = 1
    lo, hi = uni_range_np(int(Op.SIN), 0.0, 0.0, math.pi)
    assert hi == pytest.approx(1.0)
    assert lo == pytest.approx(0.0, abs=1e-12)
    # x^3 spanning zero is monotone
    lo, hi = uni_range_np(int(Op.POWK), 3.0, -2.0, 1.0)
    assert (lo, hi) == pytest.approx((-8.0, 1.0))
    # 1/x across the pole: unbounded both ways
    lo, hi = uni_range_np(int(Op.POWK), -1.0, -1.0, 1.0)
    assert lo == -INF and hi == INF
    # |x| over [-3, 2]
    lo, hi = uni_range_np(int(Op.ABS), 0.0, -3.0, 2.0)
    assert (lo, hi) == pytest.approx((0.0, 3.0))


def test_term_meta_shapes():
    m = term_meta(int(Op.EXP), 0.0)
    assert m["shape_span"] == 0          # convex everywhere
    m = term_meta(int(Op.LOG), 0.0)
    assert m["shape_pos"] == 1 and m["dom_lo"] == 0.0
    m = term_meta(int(Op.POWK), 3.0)
    assert (m["shape_neg"], m["shape_span"], m["shape_pos"]) == (1, 2, 0)
    m = term_meta(int(Op.TANH), 0.0)
    assert (m["shape_neg"], m["shape_pos"]) == (0, 1)


def test_transform_general_exprs():
    # obj: exp(x0) + x0*x1, con: log(x1 + 1) >= 0.5  (x1 >= sqrt(e)-1)
    p = Problem("gen")
    p.new_variable(0, 2)
    p.new_variable(0, 2)
    g = ExprGraph()
    g.set_root(g.node(Op.LOG, g.node(Op.PLUS, g.var(1), g.num(1.0))))
    p.new_constraint(Function(nlf=g), 0.5, INF)
    go = ExprGraph()
    go.set_root(go.node(Op.PLUS, go.node(Op.EXP, go.var(0)),
                        go.node(Op.MULT, go.var(0), go.var(1))))
    p.new_objective(Function(nlf=go))
    gs = transform(p)
    assert gs.n_u == 2                    # exp(x0), log(w)
    assert gs.n_y == 1                    # x0*x1
    # one aux defining row for w = x1 + 1
    assert gs.A.shape[0] == p.n_cons + 1
    # aux bounds are sound supersets
    assert gs.vlb[gs.uni_y[0]] <= 1.0 <= gs.vub[gs.uni_y[0]]


# -------------------------------------------------------------- end-to-end
def test_convex_exp_via_envelopes():
    # min exp(x) - 2x over [0, 2]: optimum 2 - 2 ln 2 at x = ln 2
    p = Problem("exp1")
    p.new_variable(0, 2)
    _nl_obj(p, lambda g: g.node(Op.EXP, g.var(0)),
            lf=LinearFunction({0: -2.0}))
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(2 - 2 * math.log(2), abs=1e-5)
    assert bab.best_x[0] == pytest.approx(math.log(2), abs=1e-3)


def test_nonconvex_cubic():
    # min x^3 - 4x over [-1, 3]: optimum -16/(3 sqrt 3) at x = 2/sqrt(3)
    p = Problem("cubic")
    p.new_variable(-1, 3)
    _nl_obj(p, lambda g: g.node(Op.POWK, g.var(0), const=3.0),
            lf=LinearFunction({0: -4.0}))
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-16.0 / (3 * math.sqrt(3.0)), abs=1e-5)
    assert bab.best_x[0] == pytest.approx(2 / math.sqrt(3.0), abs=1e-3)


def test_nonconvex_sin():
    # min sin(x) over [0, 2 pi]: optimum -1 at 3 pi / 2 (range-only terms)
    p = Problem("sin1")
    p.new_variable(0, 2 * math.pi)
    _nl_obj(p, lambda g: g.node(Op.SIN, g.var(0)))
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-1.0, abs=1e-5)
    assert bab.best_x[0] == pytest.approx(3 * math.pi / 2, abs=1e-2)


def test_gaussian_composition():
    # min -exp(-x^2) over [-1, 2]: optimum -1 at x = 0 (EXP o UMINUS o SQR)
    p = Problem("gauss")
    p.new_variable(-1, 2)
    _nl_obj(p, lambda g: g.node(
        Op.UMINUS, g.node(Op.EXP, g.node(Op.UMINUS,
                                         g.node(Op.SQR, g.var(0))))))
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-1.0, abs=1e-5)
    assert bab.best_x[0] == pytest.approx(0.0, abs=1e-3)


def test_abs_v_shape():
    # min |x - 1| + 0.5 x over [-3, 3]: optimum 0.5 at x = 1
    p = Problem("absv")
    p.new_variable(-3, 3)
    g = ExprGraph()
    g.set_root(g.node(Op.ABS, g.node(Op.MINUS, g.var(0), g.num(1.0))))
    p.new_objective(Function(lf=LinearFunction({0: 0.5}), nlf=g))
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(0.5, abs=1e-5)
    assert bab.best_x[0] == pytest.approx(1.0, abs=1e-3)


def test_fractional_power_constraint():
    # min -x - y  s.t. y <= sqrt(x), x in [0, 4], y in [0, 4]
    # optimum at x=4, y=2 -> -6
    p = Problem("sqrtc")
    p.new_variable(0, 4)
    p.new_variable(0, 4)
    g = ExprGraph()
    g.set_root(g.node(Op.MINUS, g.var(1),
                      g.node(Op.SQRT, g.var(0))))
    p.new_constraint(Function(nlf=g), -INF, 0.0)
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: -1.0})))
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-6.0, abs=1e-4)


def test_division_term():
    # min x / y s.t. x in [1, 4], y in [1, 2]: optimum 0.5 at (1, 2)
    p = Problem("divt")
    p.new_variable(1, 4)
    p.new_variable(1, 2)
    _nl_obj(p, lambda g: g.node(Op.DIV, g.var(0), g.var(1)))
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(0.5, abs=1e-5)


def test_minlp_with_exp():
    # min exp(x) - 3 z  s.t. x >= z, z binary; optimum exp(1) - 3 at z=1
    p = Problem("minlp-exp")
    from minotaur_tpu.utils.types import VarType
    p.new_variable(0, 2)
    p.new_variable(0, 1, VarType.BINARY)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: -1.0})),
                     0.0, INF)
    _nl_obj(p, lambda g: g.node(Op.EXP, g.var(0)),
            lf=LinearFunction({1: -3.0}))
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(math.e - 3.0, abs=1e-5)
