"""Smoke-run every example in examples/ (reference ships 22 demo apps;
these are the TPU-native gallery).  Each example exposes main() and is
invoked in-process so conftest's CPU platform pin applies."""

import importlib.util
import os
import sys

import pytest

pytestmark = pytest.mark.slow

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_simple_bnb():
    bab = _load("simple_bnb").main(node_batch=4, log_level=1)
    assert bab.ub < 1e19 and bab.best_x is not None


def test_simple_qg():
    bab = _load("simple_qg").main(node_batch=4, log_level=1)
    assert bab.ub < 1e19


def test_simple_glob():
    bab = _load("simple_glob").main(node_batch=4, log_level=1)
    # optimum -4 at (2, 2, 0): -x0*x1 - x2 with x0+x1+2x2 <= 4
    assert bab.ub == pytest.approx(-4.0, abs=1e-4)


def test_outer_approx():
    bab = _load("outer_approx").main(node_batch=4, log_level=1)
    # nearest integer point to (1.3, 2.6) satisfying x0+x1>=2 -> (1, 3)
    assert bab.ub == pytest.approx(0.09 + 0.16, abs=1e-5)


def test_multilinear_demo():
    bab = _load("multilinear_demo").main(node_batch=4, log_level=1)
    assert bab.ub < 1e19


def test_batched_engine():
    res = _load("batched_engine").main(batch=4)
    import numpy as np
    assert np.asarray(res.status).shape == (4,)


def test_nl_roundtrip():
    p2 = _load("nl_roundtrip").main()
    assert p2.n_vars > 0


def test_polynomial_demo():
    poly = _load("polynomial_demo").main()
    assert poly.degree() == 3


def test_checkpoint_resume():
    bab2 = _load("checkpoint_resume").main(log_level=1)
    assert bab2.ub == pytest.approx(23.449673, abs=1e-4)


def test_multistart_demo():
    bab = _load("multistart_demo").main(log_level=1)
    assert bab.ub <= -0.95


def test_expr_dag_demo():
    val, grad, (nlo, nhi) = _load("expr_dag_demo").main(log=False)
    import numpy as np
    assert val == pytest.approx(np.exp(0.5) + 2.0, abs=1e-10)
    assert grad[2] == pytest.approx(0.5, abs=1e-10)


def test_root_relaxation():
    obj0, obj1 = _load("root_relaxation").main(log=False)
    # nvs08 continuous relaxation; the down-branch can only raise the bound
    assert obj0 == pytest.approx(21.72254, abs=1e-4)
    assert obj1 >= obj0 - 1e-7


def test_custom_brancher():
    results = _load("custom_brancher").main(node_batch=8, log=False)
    ubs = {rule: ub for rule, (ub, _) in results.items()}
    assert set(results) == {"maxvio", "lexico", "random"}
    # every rule must land on the same optimum
    assert max(ubs.values()) - min(ubs.values()) < 1e-5


def test_qpdive_demo():
    cands = _load("qpdive_demo").main(log=False)
    assert cands, "QP diving found no feasible candidate"
    x, val = cands[0]
    import numpy as np
    assert np.isfinite(val)


def test_rlt_demo():
    out = _load("rlt_demo").main(log=False)
    # RLT cuts strictly lift the root dual bound on this model
    assert out[(12, 1)][1] > out[(0, 1)][1] + 0.5
    assert out[(12, 30)][1] >= out[(0, 30)][1] - 1e-6


def test_quad_socp():
    bab = _load("quad_socp").main(node_batch=4, log=False)
    assert bab.ub == pytest.approx(-4.0, abs=1e-5)


def test_bilinear_demo():
    bab = _load("bilinear_demo").main(node_batch=8, log=False)
    assert bab.ub < 1e19
    assert bab.lb <= bab.ub + 1e-6


def test_water_network():
    bab = _load("water_network").main(log=False)
    # Haverly pooling: global optimum profit 400; lb must stay sound
    assert bab.lb <= -400.0 + 1e-4
    assert bab.ub == pytest.approx(-400.0, abs=1e-3)


def test_benders_demo():
    import numpy as np
    mod = _load("benders_demo")
    y, cost = mod.main(log=False)
    # brute-force the tiny instance with the demo's own subproblem pricer
    from minotaur_tpu.engines.ipm import build_batch_solver
    sub = mod._build_sub()
    solve = build_batch_solver(sub)
    nf = len(mod.F_COST)
    best = np.inf
    for mask in range(2 ** nf):
        yy = np.array([(mask >> i) & 1 for i in range(nf)], float)
        tot = float(mod.F_COST @ yy)
        for s in range(len(mod.PROBS)):
            clb = np.concatenate([mod.DEMANDS[s], -mod.CAP * yy])
            r = solve(sub.A, clb, sub.cub, sub.vlb[None, :],
                      sub.vub[None, :])
            tot += float(mod.PROBS[s]) * float(r.obj[0])
        best = min(best, tot)
    assert cost == pytest.approx(best, rel=1e-5)


def test_qpd_processor_demo():
    from minotaur_tpu.utils.types import SolveStatus
    st, ub, verified = _load("qpd_processor_demo").main(log=False)
    assert st == SolveStatus.SOLVED_OPTIMAL
    assert abs(ub - 23.449673) < 1e-4
    assert verified > 0


def test_reliability_branching_demo():
    from minotaur_tpu.utils.types import SolveStatus
    st, ub, probes = _load("reliability_branching_demo").main(log=False)
    assert st == SolveStatus.SOLVED_OPTIMAL
    assert probes > 0
