"""Root substitution presolve + postsolve (bnb/substitute.py).

Reference semantics: LinearHandler.cpp:1429 substVars_ (doubleton
elimination), Presolver.cpp:288 getPostSol (solution lift)."""

import numpy as np
import pytest

from minotaur_tpu.bnb.substitute import substitute_problem
from minotaur_tpu.ir.functions import (Function, LinearFunction,
                                       QuadraticFunction)
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.types import VarType

_INF = float("inf")


def _chain_problem():
    """min (x-3)^2 + y + w  s.t.  y - 2x = 1 (doubleton eq),
    w = 5 (fixed), x int in [0, 10], y in [0, 30], w in [5, 5].
    y and w are linear-only -> both eliminable; optimum at x = 2 or 3:
    obj = (x-3)^2 + (2x+1) + 5; x=2: 1+5+5=11, x=3: 0+7+5=12 -> x=2."""
    p = Problem("chain")
    p.new_variable(0, 10, VarType.INTEGER, "x")
    p.new_variable(0.0, 30.0, VarType.CONTINUOUS, "y")
    p.new_variable(5.0, 5.0, VarType.CONTINUOUS, "w")
    p.new_constraint(Function(lf=LinearFunction({1: 1.0, 0: -2.0})),
                     1.0, 1.0, "def_y")
    qf = QuadraticFunction({(0, 0): 1.0})
    lf = LinearFunction({0: -6.0, 1: 1.0, 2: 1.0})
    p.new_objective(Function(lf=lf, qf=qf), const=9.0)
    p.debug_sol = np.array([2.0, 5.0, 5.0])
    return p


def test_substitution_eliminates_and_lifts():
    p = _chain_problem()
    red = substitute_problem(p)
    assert red is not None
    q, post = red
    assert post.n_eliminated == 2
    assert q.n_vars == 1
    # y's bounds folded into x: y = 2x+1 in [0,30] -> x <= 14.5 (slack),
    # x keeps [0, 10]
    assert q.vars[0].lb == 0 and q.vars[0].ub <= 10
    # debug_sol survived the reduction
    assert q.debug_sol is not None and q.is_debug_sol_feas(atol=1e-6)
    # objective identical through the lift
    for xv in (0.0, 2.0, 7.0):
        x_red = np.array([xv])
        x_full = post.lift(x_red)
        assert np.all(np.isfinite(x_full))
        assert p.is_feasible(x_full, atol=1e-8, int_tol=1.0)
        assert q.eval_objective(x_red) == pytest.approx(
            p.eval_objective(x_full), abs=1e-9)


def test_substitution_solve_matches_and_postsolves():
    from minotaur_tpu.bnb.bnb import BranchAndBound
    from minotaur_tpu.utils.environment import Environment
    vals = {}
    for sub in (0, 1):
        p = _chain_problem()
        env = Environment()
        env.set_option("node_batch", 4)
        env.set_option("log_level", 1)
        env.set_option("presolve_subst", sub)
        bab = BranchAndBound(p, env)
        bab.solve()
        vals[sub] = bab.ub
        if sub:
            assert bab.postsolve is not None
            assert bab.sp.n == 1                  # staged n shrank
            xo = bab.best_x_original
            assert xo.shape == (3,)
            assert bab.problem_original.is_feasible(xo, atol=1e-6,
                                                    int_tol=1e-6)
    assert vals[0] == pytest.approx(11.0, abs=1e-6)
    assert vals[1] == pytest.approx(11.0, abs=1e-6)


def test_substitution_noop_without_structure():
    from minotaur_tpu.models.generators import correlated_knapsack
    assert substitute_problem(correlated_knapsack(n=10, seed=0)) is None


def test_substitution_keeps_nonlinear_occurrences():
    """A var used in a quadratic term must never be eliminated even if a
    doubleton equality defines it."""
    p = Problem("nl_guard")
    p.new_variable(0, 5, VarType.CONTINUOUS, "a")
    p.new_variable(0, 5, VarType.CONTINUOUS, "b")
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: -1.0})),
                     1.0, 1.0, "eq")
    p.new_objective(Function(qf=QuadraticFunction({(0, 0): 1.0,
                                                   (1, 1): 1.0})))
    assert substitute_problem(p) is None
