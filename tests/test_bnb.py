"""End-to-end branch-and-bound tests.

Reference analogue: NLPBnbUT builds a full B&B on tiny MINLPs and asserts
the optimum (NLPBnbUT.cpp:287-333).  Expected values:
  milp.nl      : 1.0   (parity argument: 2*(sum of ints) + x4 = 1)
  nvs08.nl     : 2 + (4 + 5**(-2/7))**2 = 23.4497273476 — analytic optimum
                 of the shipped file (MINLPLib's published 23.449673 sits
                 at a point violating C2 by 2.5e-4, see test below)
  minlp_eg0.nl : 0.0   (x = (0,0,-1 or x1=1), objective x0x3+x1x2+x4)
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from minotaur_tpu.bnb.bnb import BranchAndBound, solve_file
from minotaur_tpu.io.nl_reader import read_nl
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus

from conftest import REF_INSTANCES, REF_TEST_INSTANCES


def _env(batch=16, nodes=2000, tl=120.0):
    env = Environment()
    env.set_option("node_batch", batch)
    env.set_option("bnb_node_limit", nodes)
    env.set_option("bnb_time_limit", tl)
    env.set_option("log_level", 1)
    return env


def test_milp():
    bab = solve_file(os.path.join(REF_INSTANCES, "milp.nl"), _env())
    assert bab.status == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(1.0, abs=1e-6)


def test_nvs08():
    bab = solve_file(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"), _env())
    assert bab.status == SolveStatus.SOLVED_OPTIMAL
    expected = 2.0 + (4.0 + 5.0 ** (-2.0 / 7.0)) ** 2
    assert bab.ub == pytest.approx(expected, abs=1e-5)
    # solution: x1=4, x2=3, x0 = 5^(-2/7)
    assert bab.best_x[1] == pytest.approx(4.0)
    assert bab.best_x[2] == pytest.approx(3.0)


def test_nvs08_published_point_is_infeasible():
    """Documents why our optimum differs from MINLPLib's 23.449673: that
    value implies x0 ~ 0.63137, violating c2 (x2^2 - x0^-3.5 - 4 x1 >= -12)
    by ~2.5e-4."""
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    x0 = np.sqrt(23.449673 - 2.0) - 4.0
    assert not p.is_feasible(np.array([x0, 4.0, 3.0]), atol=1e-5)


def test_minlp_eg0():
    bab = solve_file(os.path.join(REF_INSTANCES, "minlp_eg0.nl"), _env())
    assert bab.status == SolveStatus.SOLVED_OPTIMAL
    # optimum 0; epsilon-feasible incumbents may dip ~sqrt(feastol) below
    assert bab.ub == pytest.approx(0.0, abs=1e-4)


def test_infeasible_lp_tree():
    bab = solve_file(os.path.join(REF_INSTANCES, "lp_eg0.nl"), _env())
    assert bab.status == SolveStatus.SOLVED_INFEASIBLE


def test_pure_lp_solves_at_root():
    bab = solve_file(os.path.join(REF_INSTANCES, "lp0.nl"), _env())
    assert bab.status == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(-59.0 / 7.0, abs=1e-6)
    assert bab.stats.nodes_processed == 1


def test_luedtke_converges_from_cold_start():
    """Round 1 stalled on luedtke-1 (zero cold start fell into an
    infeasible merit attractor; the node went unresolved).  The NLP
    globalization work (midpoint cold starts + monotone exact-penalty +
    theta-acceptance + lane restarts) converges it to the known local
    optimum 72.0975 — matching what the reference gets from Ipopt's
    restoration (IpoptEngine.cpp:668).  Soundness coverage for genuinely
    unresolvable relaxations lives in
    test_unbounded_nlp_not_claimed_optimal (hess.nl)."""
    bab = solve_file(os.path.join(REF_INSTANCES, "luedtke-1.nl"),
                     _env(nodes=50, tl=120))
    assert bab.status == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(72.09753, abs=1e-3)


def test_debug_sol_oracle():
    """debug_sol survives the tree (reference Presolver.cpp:160-166)."""
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    x0 = 5.0 ** (-2.0 / 7.0)
    p.debug_sol = np.array([x0 + 1e-9, 4.0, 3.0])
    assert p.is_debug_sol_feas(atol=1e-6)


def test_unbounded_nlp_not_claimed_optimal():
    """hess.nl's relaxation dives to -2.7e11 under an iteration-limited
    engine; the feasible iterate may become the incumbent, but the node
    must stay unresolved so no 'optimal' claim is made (soundness)."""
    bab = solve_file(os.path.join(REF_INSTANCES, "hess.nl"),
                     _env(nodes=30, tl=90))
    assert bab.status != SolveStatus.SOLVED_OPTIMAL
    assert bab.lb == -np.inf or bab.stats.unresolved > 0
