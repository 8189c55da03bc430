"""Perspective detection + cut tests (reference: PerspCon,
PerspCutGenerator, PerspCutHandler)."""

import numpy as np
import pytest

from minotaur_tpu.bnb.persp import detect_perspective
from minotaur_tpu.bnb.qg import QGBranchAndBound
from minotaur_tpu.engines.staging import stage_problem
from minotaur_tpu.ir.functions import Function, LinearFunction, \
    QuadraticFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus, VarType

INF = float("inf")


def _semicont():
    # min -x + 0.9 z  s.t.  x^2 <= 2,  x <= 4 z,  x in [0,4], z binary
    # optimum: z=1, x=sqrt(2): 0.9 - sqrt(2)
    p = Problem("semicont")
    p.new_variable(0, 4)                      # x
    p.new_variable(0, 1, VarType.BINARY)      # z
    qf = QuadraticFunction()
    qf.add_term(0, 0, 1.0)
    p.new_constraint(Function(qf=qf), -INF, 2.0)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: -4.0})),
                     -INF, 0.0)
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: 0.9})))
    return p


def test_detection():
    sp = stage_problem(_semicont())
    persp = detect_perspective(sp)
    assert len(persp) == 1
    assert persp[0].z == 1
    assert list(persp[0].vars) == [0]


def test_detection_rejects_uncontrolled():
    # same but x's indicator row missing -> no perspective structure
    p = Problem("plain")
    p.new_variable(0, 4)
    p.new_variable(0, 1, VarType.BINARY)
    qf = QuadraticFunction()
    qf.add_term(0, 0, 1.0)
    p.new_constraint(Function(qf=qf), -INF, 2.0)
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: 0.9})))
    assert detect_perspective(stage_problem(p)) == []


@pytest.mark.parametrize("use_persp", [True, False])
def test_qg_semicontinuous(use_persp):
    env = Environment()
    env.set_option("log_level", 1)
    env.set_option("persp_cuts", use_persp)
    env.set_option("node_batch", 8)
    bab = QGBranchAndBound(_semicont(), env)
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(0.9 - np.sqrt(2.0), abs=1e-5)


def test_persp_cut_validity():
    """Cuts generated at fractional points never cut integer-feasible
    points."""
    p = _semicont()
    env = Environment()
    env.set_option("log_level", 1)
    bab = QGBranchAndBound(p, env)
    bab._qg_root()
    # force persp cuts at several fractional points
    pts = np.array([[1.0, 0.5], [2.0, 0.7], [0.5, 0.3], [1.2, 0.9]])
    bab._persp_cuts_at(pts)
    rows = slice(bab._cut_base, bab._cut_base + bab.n_cuts)
    A = bab.mA[rows]
    ub = bab.mcub[rows]
    lb = bab.mclb[rows]
    for z in (0.0, 1.0):
        for x in np.linspace(0, 4, 41):
            if x * x <= 2 + 1e-9 and x <= 4 * z + 1e-9:
                pt = np.zeros(bab.sp.n)
                pt[0], pt[1] = x, z
                vals = A @ pt
                assert np.all(vals <= ub + 1e-7)
                assert np.all(vals >= lb - 1e-7)


def _semicont_multi(n=3):
    """min sum(-x_i + c_i z_i) s.t. x_i^2 <= 2 (on/off via z_i),
    x_i <= 4 z_i, coupling sum z <= n-1."""
    p = Problem("semicont_multi")
    for i in range(n):
        p.new_variable(0, 4, VarType.CONTINUOUS, f"x{i}")
    for i in range(n):
        p.new_variable(0, 1, VarType.BINARY, f"z{i}")
    for i in range(n):
        qf = QuadraticFunction()
        qf.add_term(i, i, 1.0)
        p.new_constraint(Function(qf=qf), -INF, 2.0, f"q{i}")
        p.new_constraint(Function(lf=LinearFunction({i: 1.0, n + i: -4.0})),
                         -INF, 0.0, f"link{i}")
    p.new_constraint(Function(lf=LinearFunction(
        {n + i: 1.0 for i in range(n)})), -INF, float(n - 1), "card")
    p.new_objective(Function(lf=LinearFunction(
        {**{i: -1.0 for i in range(n)},
         **{n + i: 0.35 + 0.05 * i for i in range(n)}})))
    return p


def test_persp_reform_rewrites_and_is_exact():
    """persp_ref (reference NlPresHandler::perspRef_): rows are rewritten
    to the eps-smoothed perspective, the reformulated model keeps the
    same optimum, and its CONTINUOUS relaxation is at least as tight."""
    from minotaur_tpu.bnb.persp import perspective_reform
    from minotaur_tpu.engines.ipm import build_batch_solver

    p_ref = _semicont_multi()
    nref = perspective_reform(p_ref)
    assert nref == 3
    # the known optimum (z_i=1 for two cheapest, x=sqrt(2)) stays feasible
    import math
    x = np.zeros(6)
    x[0] = x[1] = math.sqrt(2.0)
    x[3] = x[4] = 1.0
    assert p_ref.is_feasible(x, atol=1e-6, int_tol=1e-6)

    # continuous-relaxation tightening: persp relaxation >= plain
    def root_bound(p):
        sp = stage_problem(p)
        res = build_batch_solver(sp)(sp.A, sp.clb, sp.cub,
                                     sp.vlb[None, :], sp.vub[None, :])
        assert int(res.status[0]) == 1
        return float(res.obj[0])

    plain = root_bound(_semicont_multi())
    persp = root_bound(p_ref)
    assert persp >= plain - 1e-7
    assert persp >= plain + 1e-3   # strictly tighter on this structure


@pytest.mark.slow
def test_persp_ref_end_to_end_same_optimum():
    from minotaur_tpu.bnb.bnb import BranchAndBound
    ubs = {}
    for flag in (0, 1):
        env = Environment()
        env.set_option("log_level", 0)
        env.set_option("persp_ref", flag)
        env.set_option("node_batch", 4)
        bab = BranchAndBound(_semicont_multi(), env)
        st = bab.solve()
        assert st == SolveStatus.SOLVED_OPTIMAL
        ubs[flag] = bab.ub
    assert ubs[0] == pytest.approx(ubs[1], abs=1e-5)
