"""Device-resident multi-round superstep tests (bnb/device_pool.py).

The runner executes T complete B&B rounds per device dispatch over a
fixed-capacity device node pool; these tests assert (a) identical optima
to the host-driven loop, (b) sound congestion handling (pool spills to
the host tree and the search still closes), (c) eligibility gating.
Reference semantics being preserved: BranchAndBound.cpp:424-514 node
loop + PCBProcessor::shouldPrune_ prune rules.
"""

import numpy as np
import pytest

from minotaur_tpu.bnb.bnb import BranchAndBound
from minotaur_tpu.models.generators import (convex_miqp,
                                            correlated_knapsack,
                                            knapsack_dp_optimum)
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus


def _env(dev, batch=8, cap=256, rounds=6, warm=2):
    e = Environment()
    e.set_option("node_batch", batch)
    e.set_option("bnb_node_limit", 20000)
    e.set_option("bnb_time_limit", 300)
    e.set_option("log_level", 1)
    e.set_option("device_tree", 1 if dev else 0)
    e.set_option("device_rounds", rounds)
    e.set_option("device_pool_cap", cap)
    e.set_option("device_warm_batches", warm)
    return e


def test_device_pool_knapsack_matches_dp():
    p = correlated_knapsack(n=20, seed=3)
    opt = knapsack_dp_optimum(n=20, seed=3)
    bab = BranchAndBound(p, _env(1))
    assert bab._dev_pool_ok
    st = bab.solve()
    assert st == SolveStatus.SOLVED_OPTIMAL
    assert bab._dev_pool is not None          # device mode actually ran
    assert bab.ub == pytest.approx(opt, abs=1e-6)
    assert bab.lb == pytest.approx(opt, abs=1e-5)


def test_device_pool_miqp_matches_host_loop():
    p = convex_miqp(n_cont=5, n_int=6, seed=1)
    vals = {}
    for dev in (0, 1):
        bab = BranchAndBound(p, _env(dev))
        st = bab.solve()
        assert st == SolveStatus.SOLVED_OPTIMAL
        vals[dev] = bab.ub
    assert vals[0] == pytest.approx(vals[1], abs=1e-6)


def test_device_pool_congestion_spills_and_closes():
    # a pool cap far below the open-list peak forces drain/refill
    # cycles through the host tree; the optimum must be unaffected
    p = correlated_knapsack(n=24, seed=1)
    opt = knapsack_dp_optimum(n=24, seed=1)
    bab = BranchAndBound(p, _env(1, cap=48, rounds=8))
    st = bab.solve()
    assert st == SolveStatus.SOLVED_OPTIMAL
    assert bab.ub == pytest.approx(opt, abs=1e-6)


def test_device_pool_gating():
    # nonlinear rows / aux columns / SOS make the in-device incumbent
    # test invalid; the runner must decline
    from minotaur_tpu.models.generators import bilinear_pooling
    p = bilinear_pooling(n_pairs=3, seed=0)
    bab = BranchAndBound(p, _env(1))
    assert not bab._dev_pool_ok
    e = _env(0)
    p2 = correlated_knapsack(n=10, seed=0)
    assert not BranchAndBound(p2, e)._dev_pool_ok   # option off
