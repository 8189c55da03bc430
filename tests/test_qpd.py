"""QP-diving heuristic tests (reference: QPDProcessor.{h,cpp})."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from minotaur_tpu.bnb.qpd import QPDiver, build_qp_approx
from minotaur_tpu.engines.staging import stage_problem
from minotaur_tpu.io.nl_reader import read_nl
from minotaur_tpu.utils.environment import Environment

from conftest import REF_TEST_INSTANCES


def test_qp_approx_model():
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    sp = stage_problem(p)
    x0 = 0.5 * (np.clip(sp.vlb, -10, 10) + np.clip(sp.vub, -10, 10))
    qp = build_qp_approx(sp, x0)
    assert len(qp.nl_rows) == 0
    assert qp.Qobj is None or \
        np.linalg.eigvalsh(qp.Qobj).min() >= -1e-9   # PSD projection
    # linearized rows agree with the true rows at x0
    import jax.numpy as jnp
    if sp.con_nl is not None and len(sp.nl_rows):
        g_true = sp.A @ x0 + np.zeros(sp.m)
        g_true[sp.nl_rows] += np.asarray(sp.con_nl(jnp.asarray(x0)))
        g_qp = qp.A @ x0
        for r in sp.nl_rows:
            # shifted bounds keep the same slack at x0
            if np.isfinite(sp.cub[r]):
                assert (sp.cub[r] - g_true[r]) == pytest.approx(
                    qp.cub[r] - g_qp[r], abs=1e-8)


def test_qp_dive_finds_incumbent():
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    sp = stage_problem(p)
    x0 = np.clip(0.5 * (np.clip(sp.vlb, -10, 10) +
                        np.clip(sp.vub, -10, 10)), sp.vlb, sp.vub)
    diver = QPDiver(p, sp, x0, lanes=8)
    out = diver.run(sp.vlb, sp.vub, x0)
    assert out, "QP diving found no feasible point on nvs08"
    x, val = out[0]
    assert p.is_feasible(x, atol=1e-5, int_tol=1e-6)
    assert val >= 23.449673 - 1e-6      # never below the true optimum


def test_qpdheur_wired():
    from minotaur_tpu.bnb.bnb import BranchAndBound
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    env = Environment()
    env.set_option("log_level", 1)
    env.set_option("qpdheur", True)
    env.set_option("node_batch", 16)
    env.set_option("bnb_node_limit", 400)
    env.set_option("bnb_time_limit", 120)
    bab = BranchAndBound(p, env=env)
    bab.solve()
    assert bab.ub <= 23.449673 + 1e-3


def test_qpd_node_processor_matches_optimum():
    """nodeproc=qpd: nodes are processed on the QP approximation with
    true-model verification of every prune/incumbent decision
    (reference QPDProcessor.cpp processQP_/solveNLP_ semantics)."""
    from minotaur_tpu.bnb.bnb import BranchAndBound
    from minotaur_tpu.utils.types import SolveStatus
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    env = Environment()
    env.set_option("log_level", 1)
    env.set_option("nodeproc", "qpd")
    env.set_option("node_batch", 16)
    env.set_option("bnb_node_limit", 800)
    env.set_option("bnb_time_limit", 240)
    bab = BranchAndBound(p, env=env)
    st = bab.solve()
    assert st == SolveStatus.SOLVED_OPTIMAL
    assert abs(bab.ub - 23.449673) < 1e-4
    # the prune guard actually fired: some lanes were re-solved on the
    # true model (every prune/incumbent decision passes through it)
    assert bab._qpd_verified > 0
    # sound bound too
    assert bab.lb <= bab.ub + 1e-9
