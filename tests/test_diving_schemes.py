"""MINLPDiving scheme-family parity (reference MINLPDiving.h:47-53
Scoretype = Fractional/VectorLength/LexBound/ReducedCost, Direction enum
:33-40, backtrack_ MINLPDiving.cpp:99)."""

import numpy as np
import pytest

from minotaur_tpu.bnb.heuristics import (DiveBacktrack, dive_round,
                                         dive_scheme_for_lane, dive_scores)
from minotaur_tpu.ir.functions import (Function, LinearFunction,
                                       QuadraticFunction)
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import VarType


def test_scheme_lane_dealing():
    assert [dive_scheme_for_lane("auto", b) for b in range(5)] == \
        ["frac", "veclen", "lex", "rcost", "frac"]
    assert dive_scheme_for_lane("veclen", 3) == "veclen"


def test_dive_scores_orderings():
    ints = np.arange(4)
    frac = np.array([0.4, 0.1, 0.3, 0.2])
    grad = np.array([1.0, 5.0, 1.0, 1.0])
    ncols = np.array([2.0, 1.0, 1.0, 4.0])
    avg_rc = np.array([0.0, -3.0, 2.0, 1.0])
    # least-fractional first
    assert list(np.argsort(dive_scores("frac", None, ints, frac, grad,
                                       ncols, avg_rc))) == [1, 3, 2, 0]
    # lexicographic = index order
    assert list(np.argsort(dive_scores("lex", None, ints, frac, grad,
                                       ncols, avg_rc))) == [0, 1, 2, 3]
    # vl_score = grad*frac/ncols (MINLPDiving.cpp:262-283):
    # [0.2, 0.5, 0.3, 0.05] -> 3 first
    assert list(np.argsort(dive_scores("veclen", None, ints, frac, grad,
                                       ncols, avg_rc))) == [3, 0, 2, 1]
    # reduced cost: most negative average first
    assert list(np.argsort(dive_scores("rcost", None, ints, frac, grad,
                                       ncols, avg_rc))) == [1, 0, 3, 2]


def test_dive_round_directions():
    x = np.array([1.2, 1.8])
    assert np.allclose(dive_round("ceil", x), [2.0, 2.0])
    assert np.allclose(dive_round("floor", x), [1.0, 1.0])
    assert np.allclose(dive_round("nearest", x), [1.0, 2.0])
    # farthest from the current value (MINLPDiving Direction::Farthest)
    assert np.allclose(dive_round("farthest", x), [2.0, 1.0])


def test_backtrack_two_levels():
    """First death flips the latest fix; a second death while the flip
    stands discards it and flips ONE LEVEL UP (MINLPDiving.cpp:99 + the
    dive loop's second-backtrack allowance at :369)."""
    bt = DiveBacktrack()
    lo, hi = np.zeros(3), np.full(3, 5.0)
    bt.push(lo, hi, np.array([0]), np.array([2.0]))     # level 1: x0=2
    lo2, hi2 = lo.copy(), hi.copy()
    lo2[0] = hi2[0] = 2.0
    bt.push(lo2, hi2, np.array([1]), np.array([3.0]))   # level 2: x1=3
    x = np.array([2.0, 2.6, 1.0])
    f1 = bt.on_death(x)
    assert f1 is not None
    nlo, nhi = f1
    # level-2 flip: x1 pushed the other way (3 fixed > lp 2.6 -> 2),
    # level-1 fixing x0=2 preserved
    assert nlo[1] == nhi[1] == 2.0 and nlo[0] == nhi[0] == 2.0
    f2 = bt.on_death(x)
    assert f2 is not None
    nlo, nhi = f2
    # level-1 flip: x0 2 -> 3, box back to the root box elsewhere
    assert nlo[0] == nhi[0] == 3.0
    assert nlo[1] == 0.0 and nhi[1] == 5.0
    assert bt.on_death(x) is None   # flip budget exhausted


def _demand_qcap(seed: int = 2, n: int = 8) -> Problem:
    """min c.x s.t. w.x >= D (tight demand) and sum x^2 <= cap — rounding
    DOWN the LP point violates the demand row, rounding everything up
    violates the quadratic cap, so nearest-only fractional dives die
    while the scheme/direction family survives."""
    rng = np.random.default_rng(seed)
    c = rng.uniform(1, 9, size=n)
    w = rng.uniform(1, 5, size=n)
    p = Problem("demand_qcap")
    for j in range(n):
        p.new_variable(0, 4, VarType.INTEGER, f"x{j}")
    p.new_constraint(
        Function(lf=LinearFunction({j: float(w[j]) for j in range(n)})),
        float(w.sum() * 1.3), np.inf, "dem")
    qf = QuadraticFunction()
    for j in range(n):
        qf.add_term(j, j, 1.0)
    p.new_constraint(Function(qf=qf), -np.inf, float(n * 2.9), "qcap")
    p.new_objective(Function(lf=LinearFunction(
        {j: float(c[j]) for j in range(n)})))
    return p


@pytest.mark.slow
def test_scheme_family_finds_incumbent_fractional_misses():
    """The dealt scheme/direction family (divheur_scheme=auto) produces a
    root-dive incumbent on an instance where pure fractional/nearest
    diving finds none at the same lane/round budget."""
    ubs = {}
    for scheme in ("frac", "auto"):
        env = Environment()
        env.set_option("log_level", 0)
        env.set_option("divheur", 1)
        env.set_option("divheur_scheme", scheme)
        env.set_option("bnb_node_limit", 1)   # root only: dive or nothing
        from minotaur_tpu.bnb.bnb import BranchAndBound
        bab = BranchAndBound(_demand_qcap(), env)
        bab.solve()
        ubs[scheme] = bab.ub
    assert not np.isfinite(ubs["frac"])
    assert np.isfinite(ubs["auto"])
    # the found incumbent must be genuinely feasible
    assert ubs["auto"] < 1e15
