"""IO round-trips, presolve/OBBT, multistart, and CLI solver smoke tests.

Reference analogues: AMPLInstanceUT (reader), Presolver tests via
NLPBnbUT presolve path, and the solver mains which the reference only
exercises via shell scripts (scripts/minlp-test.py).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from minotaur_tpu.engines.staging import stage_problem
from minotaur_tpu.io.mps_reader import read_mps
from minotaur_tpu.io.nl_reader import read_nl
from minotaur_tpu.io.nl_writer import write_nl
from minotaur_tpu.io.sol_writer import write_sol
from minotaur_tpu.bnb.multistart import multistart_solve
from minotaur_tpu.bnb.presolve import Presolver
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import ProblemType, SolveStatus

from conftest import REF_INSTANCES, REF_TEST_INSTANCES


MPS_SAMPLE = """NAME          test1
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    X1        COST         1.0   LIM1         1.0
    X1        LIM2         1.0
    MARKER                 'MARKER'                 'INTORG'
    X2        COST         2.0   LIM1         1.0
    X2        MYEQN       -1.0
    MARKER                 'MARKER'                 'INTEND'
    X3        COST        -1.0   MYEQN        1.0
RHS
    RHS       LIM1         4.0   LIM2         1.0
    RHS       MYEQN        7.0
BOUNDS
 UP BND       X1           4.0
 LO BND       X2          -1.0
 UP BND       X2           4.0
ENDATA
"""


def test_mps_reader(tmp_path):
    path = tmp_path / "test1.mps"
    path.write_text(MPS_SAMPLE)
    p = read_mps(str(path))
    assert p.n_vars == 3
    assert p.n_cons == 3
    assert p.vars[1].is_integer()
    assert p.vars[0].ub == pytest.approx(4.0)
    assert p.vars[1].lb == pytest.approx(-1.0)
    assert p.find_type() == ProblemType.MILP
    # objective: x1 + 2 x2 - x3
    x = np.array([1.0, 2.0, 3.0])
    assert p.eval_objective(x) == pytest.approx(1 + 4 - 3)
    # MYEQN: -x2 + x3 = 7
    assert p.eval_constraints(x)[2] == pytest.approx(1.0)


@pytest.mark.parametrize("fname", ["nvs08.nl"])
def test_nl_writer_roundtrip(fname, tmp_path):
    p = read_nl(os.path.join(REF_TEST_INSTANCES, fname))
    out = tmp_path / "out.nl"
    write_nl(p, str(out))
    p2 = read_nl(str(out))
    assert p2.n_vars == p.n_vars
    assert p2.n_cons == p.n_cons
    rng = np.random.default_rng(0)
    for _ in range(5):
        x = rng.uniform(0.5, 1.5, p.n_vars)
        assert p2.eval_objective(x) == pytest.approx(p.eval_objective(x),
                                                     rel=1e-10)
        np.testing.assert_allclose(p2.eval_constraints(x),
                                   p.eval_constraints(x), rtol=1e-10)
    # integer typing survives (nvs08 ints are inside the nonlinear block)
    assert p2.n_ints() == p.n_ints()


def test_sol_writer(tmp_path):
    path = tmp_path / "a.sol"
    write_sol(str(path), "solver: optimal", np.array([1.0, 2.5]),
              np.array([0.5]))
    text = path.read_text()
    assert "Options" in text
    assert "objno 0 0" in text
    assert "2.5" in text


def test_presolver_fbbt_and_debug_sol():
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    x0 = 5.0 ** (-2.0 / 7.0)
    p.debug_sol = np.array([x0 + 1e-9, 4.0, 3.0])
    sp = stage_problem(p)
    pre = Presolver(p, sp)
    st, vlb, vub = pre.presolve(sp.vlb.copy(), sp.vub.copy())
    assert st == SolveStatus.FINISHED
    assert np.all(vlb <= p.debug_sol + 1e-9)
    assert np.all(vub >= p.debug_sol - 1e-9)


def test_obbt_tightens_milp():
    p = read_nl(os.path.join(REF_INSTANCES, "milp.nl"))
    sp = stage_problem(p)
    pre = Presolver(p, sp)
    vlb, vub = pre.obbt(sp.vlb.copy(), sp.vub.copy())
    # 2(x0+..+x3) + x4 = 1, x in [0,1]: x0..x3 <= 0.5
    assert np.all(vub[:4] <= 0.5 + 1e-6)
    # soundness: optimal solution x4=1 inside
    assert vub[4] >= 1.0 - 1e-9


def test_multistart_hs021():
    p = read_nl(os.path.join(REF_INSTANCES, "hs021.nl"))
    sp = stage_problem(p)
    x, obj, info = multistart_solve(sp, p, n_starts=16, seed=1)
    assert x is not None
    assert obj == pytest.approx(-99.96, abs=1e-4)
    assert info["n_feasible"] > 0


def test_mbnb_cli(tmp_path, monkeypatch):
    from minotaur_tpu.solvers.mbnb import main
    monkeypatch.chdir(tmp_path)
    rc = main([os.path.join(REF_INSTANCES, "milp.nl"),
               "--write_sol_file", "1", "--log_level", "1"])
    assert rc == 0
    assert (tmp_path / "milp.sol").exists()


def test_mqg_cli():
    from minotaur_tpu.solvers.mqg import main
    rc = main([os.path.join(REF_INSTANCES, "milp.nl"), "--log_level", "1"])
    assert rc == 0


def test_cli_option_parsing():
    env = Environment()
    pos = env.read_options(["foo.nl", "--bnb_time_limit", "12",
                            "-minotaur.int_tol=1e-5", "--presolve", "0"])
    assert pos == ["foo.nl"]
    assert env.options.get("bnb_time_limit") == pytest.approx(12.0)
    assert env.options.get("int_tol") == pytest.approx(1e-5)
    assert env.options.get("presolve") is False


def test_mlstoa_cli():
    """Single-tree lazy-cut OA entry (LSTOA.cpp parity): runs the QG
    stack with violation-gated cuts enabled by default."""
    from minotaur_tpu.solvers.mlstoa import main
    rc = main([os.path.join(REF_INSTANCES, "minlp_eg0.nl"),
               "--log_level", "1", "--bnb_node_limit", "400"])
    assert rc == 0


def test_mqgpar_cli():
    """QGPar parity: --threads maps onto the node-batch axis."""
    from minotaur_tpu.solvers.mqgpar import main
    rc = main([os.path.join(REF_INSTANCES, "milp.nl"),
               "--log_level", "1", "--threads", "4"])
    assert rc == 0


def test_msbnb_cli():
    """MsBnb parity: in-tree multistart node processing."""
    from minotaur_tpu.solvers.msbnb import main
    rc = main([os.path.join(REF_TEST_INSTANCES, "nvs08.nl"),
               "--log_level", "1", "--msbnb_restarts", "2",
               "--bnb_node_limit", "200"])
    assert rc == 0
