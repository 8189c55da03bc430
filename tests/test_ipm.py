"""Batched IPM engine tests.

Reference analogues: IpoptEngineUT / AMPLOsiUT solve tiny instances and
assert optima (e.g. NLPBnbUT.cpp:287-333).  Known optimal values below were
hand-derived from the .mod sources or are standard test-set values (HS21).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from minotaur_tpu.engines.ipm import IPMOptions, build_batch_solver
from minotaur_tpu.engines.staging import stage_problem
from minotaur_tpu.io.nl_reader import read_nl
from minotaur_tpu.utils.types import EngineStatus

from conftest import REF_INSTANCES, REF_TEST_INSTANCES


def _solve(fname, d=REF_INSTANCES, bounds=None):
    p = read_nl(os.path.join(d, fname))
    sp = stage_problem(p)
    solve = build_batch_solver(sp)
    vlb, vub = sp.vlb, sp.vub
    if bounds is not None:
        vlb, vub = bounds
    return sp, solve(sp.A, sp.clb, sp.cub, vlb[None, :], vub[None, :])


def test_lp0_optimal_with_certificate():
    # Wolsey p.95: max 4x1 - x2 -> min form optimum -59/7
    sp, res = _solve("lp0.nl")
    assert int(res.status[0]) == EngineStatus.SOLVED_OPTIMAL
    assert float(res.obj[0]) == pytest.approx(-59.0 / 7.0, abs=1e-6)
    # certified dual bound is a true lower bound and tight here
    assert float(res.dual_bound[0]) <= float(res.obj[0]) + 1e-9
    assert float(res.dual_bound[0]) == pytest.approx(-59.0 / 7.0, abs=1e-5)


def test_lp_eg0_infeasible_certified():
    # x0>=0, x2>=1, x0+x2<=0 is infeasible; the dual bound must diverge
    sp, res = _solve("lp_eg0.nl")
    assert int(res.status[0]) == EngineStatus.SOLVED_INFEASIBLE
    assert float(res.dual_bound[0]) > 1e15


def test_hs021_qp():
    sp, res = _solve("hs021.nl")
    assert int(res.status[0]) == EngineStatus.SOLVED_OPTIMAL
    assert float(res.obj[0]) == pytest.approx(-99.96, abs=1e-5)


def test_qp_simplex_constrained():
    sp, res = _solve("qp.nl")
    assert int(res.status[0]) == EngineStatus.SOLVED_OPTIMAL
    assert float(res.obj[0]) == pytest.approx(0.7936507936, abs=1e-6)


def test_milp_lp_relaxation_zero():
    # min x4 s.t. 2(x0..x3)+x4 = 1, x binary-relaxed -> LP optimum 0
    sp, res = _solve("milp.nl")
    assert int(res.status[0]) == EngineStatus.SOLVED_OPTIMAL
    assert float(res.obj[0]) == pytest.approx(0.0, abs=1e-7)
    assert float(res.dual_bound[0]) <= 1e-7


def test_unconstrained_qp_3pk():
    sp, res = _solve("3pk.nl")
    assert int(res.status[0]) == EngineStatus.SOLVED_OPTIMAL
    assert float(res.obj[0]) == pytest.approx(1.7201185, abs=1e-4)


def test_nvs08_nlp_relaxation():
    # continuous relaxation bound must sit below the integer optimum
    sp, res = _solve("nvs08.nl", d=REF_TEST_INSTANCES)
    assert int(res.status[0]) == EngineStatus.SOLVED_OPTIMAL
    assert 20.0 < float(res.obj[0]) < 23.449673


def test_color_lab_qp_relaxation():
    sp, res = _solve("color_lab2_4x0.nl", d=REF_TEST_INSTANCES)
    assert int(res.status[0]) == EngineStatus.SOLVED_OPTIMAL
    assert float(res.obj[0]) > 0


def test_batched_bound_monotonicity():
    """Tightening bounds can only increase the relaxation value — solved
    as ONE vmapped batch (the core B&B device pattern)."""
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    sp = stage_problem(p)
    solve = build_batch_solver(sp)
    B = 4
    vlb = np.tile(sp.vlb, (B, 1))
    vub = np.tile(sp.vub, (B, 1))
    # lane k: x1 forced >= k*20
    for k in range(B):
        vlb[k, 1] = 20.0 * k
    res = solve(sp.A, sp.clb, sp.cub, vlb, vub)
    objs = np.asarray(res.obj)
    assert np.all(np.asarray(res.status) == EngineStatus.SOLVED_OPTIMAL)
    assert np.all(np.diff(objs) >= -1e-6), objs


def test_fixed_variable_branch():
    """Fixing an integer via vlb=vub (a branch) must be respected."""
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    sp = stage_problem(p)
    solve = build_batch_solver(sp)
    vlb = sp.vlb.copy()
    vub = sp.vub.copy()
    vlb[1] = vub[1] = 7.0
    res = solve(sp.A, sp.clb, sp.cub, vlb[None, :], vub[None, :])
    assert abs(float(res.x[0, 1]) - 7.0) < 1e-9
    assert int(res.status[0]) == EngineStatus.SOLVED_OPTIMAL


def test_farkas_early_exit():
    """Certified infeasibility exits well before the iteration budget
    (the batch runs at its slowest lane's pace)."""
    import numpy as np
    from minotaur_tpu.engines.ipm import IPMOptions, build_batch_solver
    from minotaur_tpu.engines.staging import StagedProblem
    from minotaur_tpu.utils.types import EngineStatus
    n, m = 6, 2
    A = np.zeros((m, n))
    A[0, :3] = 1.0          # x0+x1+x2 >= 10 but vars in [0,1]
    A[1, 3:] = 1.0
    sp = StagedProblem(
        name="farkas", n=n, m=m, c=np.ones(n), obj_const=0.0,
        Qobj=None, obj_nl=None, A=A,
        clb=np.array([10.0, -np.inf]), cub=np.array([np.inf, 5.0]),
        vlb=np.zeros(n), vub=np.ones(n),
        int_mask=np.zeros(n, bool), nl_rows=np.zeros(0, np.int32),
        con_nl=None, nl_graphs=[])
    solve = build_batch_solver(sp, IPMOptions(max_iters=80))
    res = solve(sp.A, sp.clb, sp.cub, sp.vlb[None, :], sp.vub[None, :])
    assert int(np.asarray(res.status)[0]) == EngineStatus.SOLVED_INFEASIBLE
    assert int(np.asarray(res.iters)[0]) < 40      # exited early
    assert float(np.asarray(res.dual_bound)[0]) > 1e15
