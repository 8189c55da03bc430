"""Reliability-branching probe tests (reference:
ReliabilityBrancher.cpp:161-236,469).

Round-2 verdict weak #2: probes only rode padding lanes, so with
pad_full and a full open list zero probe lanes existed and the machinery
never fired at steady state.  _prepare_batch now RESERVES lanes when the
probe queue is nonempty; these tests pin that probes actually run and
feed the pseudocosts.
"""

import numpy as np

from minotaur_tpu.ir.functions import Function, LinearFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus, VarType

INF = float("inf")


def _mdknap(n=12, m=3, seed=3):
    """Multi-dimensional knapsack: LP vertices carry up to m fractional
    variables, so reliability branching has real candidate sets (a
    1-constraint knapsack has exactly ONE fractional var per vertex and
    never queues probes)."""
    rng = np.random.default_rng(seed)
    v = rng.integers(8, 30, size=n).astype(float)
    W = rng.integers(5, 20, size=(m, n)).astype(float)
    caps = W.sum(axis=1) * 0.4
    p = Problem("probe_mdknap")
    for _ in range(n):
        p.new_variable(0, 1, VarType.BINARY)
    for r in range(m):
        p.new_constraint(Function(lf=LinearFunction(
            {i: W[r, i] for i in range(n)})), -INF, float(caps[r]))
    p.new_objective(Function(lf=LinearFunction(
        {i: -v[i] for i in range(n)})))
    return p, v, W, caps


def _opt_value(v, W, caps):
    # brute force over 2^n (n=12)
    n = len(v)
    best = 0.0
    for mask in range(1 << n):
        sel = np.array([(mask >> i) & 1 for i in range(n)], dtype=float)
        if np.all(W @ sel <= caps + 1e-9):
            best = max(best, float(v @ sel))
    return -best


def _solve_rel(**opts):
    from minotaur_tpu.bnb.bnb import BranchAndBound
    p, v, w, cap = _mdknap()
    env = Environment()
    env.set_option("brancher", "rel")
    env.set_option("rel_thresh", 4)
    env.set_option("node_batch", 4)
    env.set_option("pad_full", 1)
    env.set_option("bnb_node_limit", 600)
    env.set_option("bnb_time_limit", 180)
    env.set_option("log_level", 1)
    for k, val in opts.items():
        env.set_option(k, val)
    bab = BranchAndBound(p, env)
    bab.solve()
    return bab, _opt_value(v, w, cap)


def test_probes_fire_and_feed_pseudocosts():
    bab, opt = _solve_rel()
    # correctness first
    assert bab.status == SolveStatus.SOLVED_OPTIMAL
    assert abs(bab.ub - opt) < 1e-5
    # probes ran even though pad_full fills every lane (lane
    # reservation), and their results landed in the pseudocost counts
    assert bab.stats.probes > 0
    assert int(bab._pc_down_cnt.sum() + bab._pc_up_cnt.sum()) > 0
    # queue bookkeeping stays sane
    assert len(bab._probe_queue) <= 4 * bab._batch
    assert all(v >= 0 for v in bab._probe_pending.values())


def test_probes_off_when_rel_thresh_zero():
    bab, opt = _solve_rel(rel_thresh=0)
    assert bab.stats.probes == 0
    assert abs(bab.ub - opt) < 1e-5
