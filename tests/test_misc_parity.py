"""Small parity pieces: engine factory, VBC trace, option help, timers."""

import io
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from minotaur_tpu.engines.factory import EngineFactory
from minotaur_tpu.engines.staging import stage_problem
from minotaur_tpu.io.nl_reader import read_nl
from minotaur_tpu.bnb.bnb import solve_file
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.timer import Timer

from conftest import REF_INSTANCES, REF_TEST_INSTANCES


def test_engine_factory_auto():
    env = Environment()
    fac = EngineFactory(env)
    p = read_nl(os.path.join(REF_INSTANCES, "lp0.nl"))
    solve = fac.get_engine(p)
    sp = stage_problem(p)
    res = solve(sp.A, sp.clb, sp.cub, sp.vlb[None, :], sp.vub[None, :])
    assert float(res.obj[0]) == pytest.approx(-59.0 / 7.0, abs=1e-6)


def test_engine_factory_rejects_unknown():
    env = Environment()
    env.set_option("lp_engine", "cplex")
    fac = EngineFactory(env)
    p = read_nl(os.path.join(REF_INSTANCES, "lp0.nl"))
    with pytest.raises(ValueError):
        fac.get_lp_engine(stage_problem(p))


def test_vbc_trace(tmp_path):
    """VBC tree-trace output (reference: TreeManager.cpp:61-76)."""
    vbc = tmp_path / "tree.vbc"
    env = Environment()
    env.set_option("vbc_file", str(vbc))
    env.set_option("node_batch", 8)
    env.set_option("log_level", 1)
    solve_file(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"), env)
    text = vbc.read_text()
    assert text.startswith("#TYPE: COMPLETE TREE")
    assert "P 1 " in text        # root event
    assert text.count("\n") > 3  # children recorded


def test_option_help_dump():
    env = Environment()
    buf = io.StringIO()
    env.options.write_help(buf.write)
    text = buf.getvalue()
    assert "--bnb_time_limit" in text
    assert "--node_batch" in text


def test_timer_cpu_wall():
    t = Timer()
    t.start()
    sum(i * i for i in range(200000))
    assert t.query_cpu() > 0.0
    assert t.query_wall() >= t.query_cpu() * 0.1


def test_qg_violation_gated_ecp():
    """max_vio_per > 0 switches ECP cuts to violation-score gating
    (reference QGHandlerAdvance maxVioPer): same optimum, never MORE
    cuts than the cadence mode, and nodes carry inherited scores."""
    import numpy as np
    from minotaur_tpu.bnb.qg import QGBranchAndBound
    from minotaur_tpu.ir.functions import Function, LinearFunction, \
        QuadraticFunction
    from minotaur_tpu.ir.problem import Problem
    from minotaur_tpu.utils.types import VarType

    def build():
        p = Problem("vio-gate")
        for _ in range(3):
            p.new_variable(0.0, 4.0, vtype=VarType.INTEGER)
        qf = QuadraticFunction()
        for i in range(3):
            qf.add_term(i, i, 1.0)
        p.new_constraint(Function(qf=qf), -np.inf, 11.0)
        p.new_objective(Function(lf=LinearFunction(
            {0: -1.0, 1: -1.3, 2: -0.7})))
        return p

    results = {}
    for mvp in (0.0, 1.0):
        env = Environment()
        env.set_option("log_level", 1)
        env.set_option("max_vio_per", mvp)
        env.set_option("bnb_node_limit", 600)
        bab = QGBranchAndBound(build(), env)
        bab.solve()
        results[mvp] = (bab.ub, bab.qg_stats.cuts_added)
    assert results[0.0][0] == pytest.approx(results[1.0][0], abs=1e-6)
    assert results[1.0][1] <= results[0.0][1]
