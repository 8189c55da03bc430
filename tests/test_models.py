"""Generator-family smoke tests across the three solver pipelines."""

import numpy as np
import pytest

from minotaur_tpu.bnb.bnb import BranchAndBound
from minotaur_tpu.glob.glob_bnb import GlobBranchAndBound
from minotaur_tpu.models.generators import bilinear_pooling, convex_miqp, \
    quadratic_knapsack
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus


def _env():
    env = Environment()
    env.set_option("node_batch", 16)
    env.set_option("bnb_node_limit", 1500)
    env.set_option("bnb_time_limit", 120)
    env.set_option("log_level", 1)
    return env


def test_convex_miqp_bnb():
    p = convex_miqp(n_cont=3, n_int=3, seed=1)
    bab = BranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    # integer coordinates are integral, solution feasible
    assert p.is_feasible(bab.best_x, atol=1e-5)


def test_bilinear_pooling_glob():
    p = bilinear_pooling(n_pairs=2, seed=2)
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    # each pair's optimum is -c*(cap/2)^2: verify against brute grid
    from minotaur_tpu.engines.staging import stage_problem
    best = bab.ub
    rng = np.random.default_rng(0)
    for _ in range(2000):
        x = rng.uniform(0, 4, p.n_vars)
        if p.is_feasible(x, atol=1e-9):
            assert p.eval_objective(x) >= best - 1e-5


def test_quadratic_knapsack_glob():
    p = quadratic_knapsack(n=8, seed=3)
    bab = GlobBranchAndBound(p, _env())
    assert bab.solve() == SolveStatus.SOLVED_OPTIMAL
    # verify against exhaustive enumeration of the 2^8 binaries
    import itertools
    best = np.inf
    for bits in itertools.product([0.0, 1.0], repeat=8):
        x = np.array(bits)
        if p.is_feasible(x, atol=1e-9):
            best = min(best, p.eval_objective(x))
    assert bab.ub == pytest.approx(best, abs=1e-5)
