"""SamplingHeur / FixVarsHeur tests (reference: SamplingHeur.{h,cpp},
FixVarsHeur.{h,cpp} wired in Bnb.cpp:152-169)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from minotaur_tpu.bnb.bnb import BranchAndBound
from minotaur_tpu.bnb.heuristics import FixVarsHeur, SamplingHeur
from minotaur_tpu.engines.staging import stage_problem
from minotaur_tpu.ir.functions import Function, LinearFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus, VarType

INF = float("inf")


def _milp():
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


def test_sampling_heur_finds_feasible():
    p = _milp()
    sp = stage_problem(p)
    h = SamplingHeur(p, sp, seed=3, n_samples=512)
    out = h.run(sp.vlb, sp.vub)
    assert out
    xs, vals = out[0]
    assert p.is_feasible(xs, atol=1e-6, int_tol=1e-6)
    assert vals == min(v for _, v in out)


def test_fixvars_heur_solves_continuous_rest():
    p = _milp()
    sp = stage_problem(p)
    h = FixVarsHeur(p, sp, seed=1)
    x_ref = np.array([1.0, 0.2, 2.0])
    out = h.run(sp.vlb, sp.vub, x_ref, n_tries=4)
    assert out
    x, val = out[0]
    assert p.is_feasible(x, atol=1e-5, int_tol=1e-6)
    # fixing x0=1, x1=0 leaves max x2=4 -> value -6 (the optimum)
    assert val == pytest.approx(-6.0, abs=1e-4)


def test_heuristics_wired_into_bnb():
    env = Environment()
    env.set_option("log_level", 1)
    env.set_option("samplingheur", True)
    env.set_option("fixvarsheur", True)
    env.set_option("node_batch", 4)
    bab = BranchAndBound(_milp(), env=env)
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-6.0, abs=1e-6)
