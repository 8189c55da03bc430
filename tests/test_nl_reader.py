"""Tests for the .nl front end.

Mirrors the reference's AMPLInstanceUT strategy (reference:
src/testing/AMPLInstanceUT.cpp): read the shipped instances, check counts,
types, bounds and evaluate functions at known points.
"""

import glob
import os

import numpy as np
import pytest

from minotaur_tpu.io.nl_reader import NlReader, read_nl
from minotaur_tpu.utils.types import INF, ProblemType, VarType

from conftest import REF_INSTANCES, REF_TEST_INSTANCES


ALL_NL = sorted(glob.glob(os.path.join(REF_INSTANCES, "*.nl")) +
                glob.glob(os.path.join(REF_TEST_INSTANCES, "*.nl")))


@pytest.mark.parametrize("path", ALL_NL, ids=[os.path.basename(p) for p in ALL_NL])
def test_parses(path):
    p = read_nl(path)
    assert p.n_vars > 0


def test_nvs08_structure():
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    assert p.n_vars == 3
    assert p.n_cons == 3
    assert p.find_type() == ProblemType.MINLP
    # var 0 continuous in [1e-3, 200]; vars 1,2 integer in [0, 200]
    assert p.vars[0].vtype == VarType.CONTINUOUS
    assert p.vars[0].lb == pytest.approx(1e-3)
    assert p.vars[0].ub == pytest.approx(200)
    assert p.vars[1].is_integer() and p.vars[2].is_integer()
    # constraints are all >=
    assert p.cons[0].lb == pytest.approx(10.0) and p.cons[0].ub == INF
    assert p.cons[1].lb == pytest.approx(-3.0)
    assert p.cons[2].lb == pytest.approx(-12.0)


def test_nvs08_eval():
    """Evaluate objective/constraints at a point; values checked against a
    hand computation of the published formulation:
      obj = (x1-3)^2 + (x2-2)^2 + (x0+4)^2   [shifted forms in the file]
      c0  = sqrt(x0) + x1 + 2 x2 >= 10
    """
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    x = np.array([4.0, 3.0, 2.0])
    # objective: (-3+x1)^2 + (-2+x2)^2 + (4+x0)^2 = 0 + 0 + 64
    assert p.eval_objective(x) == pytest.approx(64.0)
    g = p.eval_constraints(x)
    assert g[0] == pytest.approx(np.sqrt(4.0) + 3.0 + 2 * 2.0)


def test_milp_structure():
    p = read_nl(os.path.join(REF_INSTANCES, "milp.nl"))
    assert p.find_type() == ProblemType.MILP
    assert p.n_vars == 5 and p.n_cons == 1
    assert all(v.vtype == VarType.BINARY for v in p.vars)
    # constraint: 2x0+2x1+2x2+2x3+x4 = 1
    assert p.cons[0].lb == pytest.approx(1.0)
    assert p.cons[0].ub == pytest.approx(1.0)
    x = np.zeros(5)
    x[4] = 1.0
    assert p.eval_constraints(x)[0] == pytest.approx(1.0)
    # objective = x4 (linear, G0: 4 1)
    assert p.eval_objective(x) == pytest.approx(1.0)


def test_binary_format_color_lab():
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "color_lab2_4x0.nl"))
    assert p.n_vars == 300
    assert p.n_cons == 61
    assert p.n_ints() == 300
    # objective extracted to a quadratic (45450-term sum folds into Q)
    assert p.obj.fun.qf is not None and len(p.obj.fun.qf) > 0
    assert p.find_type() == ProblemType.MIQP
    # first 3 constraints are == 1 (set partition rows)
    assert p.cons[0].lb == pytest.approx(1.0)
    assert p.cons[0].ub == pytest.approx(1.0)


def test_allfuns_every_operator():
    """allfuns.nl exercises every ASL operator the reference supports
    (reference: src/testing/instances/allfuns.mod)."""
    p = read_nl(os.path.join(REF_INSTANCES, "allfuns.nl"))
    assert p.n_cons == 23
    # 0.7 avoids the pole in c13 (division by x-0.5)
    x = np.full(p.n_vars, 0.7)
    vals = p.eval_constraints(x)
    assert np.all(np.isfinite(vals))


def test_quadratic_extraction_minlp_eg0():
    p = read_nl(os.path.join(REF_INSTANCES, "minlp_eg0.nl"))
    # C0: x1^2+x2^2+x0^2 extracted as pure quadratic
    c0 = p.cons[0]
    assert c0.fun.qf is not None and len(c0.fun.qf) == 3
    assert c0.fun.nlf is None
    # C1: x1^3 + x1^2 stays nonlinear
    c1 = p.cons[1]
    assert c1.fun.nlf is not None
    x = np.array([1.0, 2.0, 3.0, 0.0, 0.0])
    assert c0.fun.eval(x) == pytest.approx(14.0)
    assert c1.fun.eval(x) == pytest.approx(8.0 + 4.0)


def test_defined_vars_inline():
    """Synthetic instance with a V (common expression) segment."""
    txt = """g3 0 1 0
 2 1 1 0 0
 1 1
 0 0
 2 2 2
 0 0 0 1
 0 0 0 0 0
 2 2
 0 0
 1 0 0 0 0
V2 1 0
0 2.5
o5
v1
n3
C0
o2
v2
n2
r
1 10
b
0 0 5
0 0 5
J0 2
0 0
1 0
O0 0
v2
G0 2
0 0
1 0
"""
    p = NlReader().read_string(txt, "defvar")
    x = np.array([2.0, 1.5])
    # v2 = 2.5*x0 + x1^3 = 5 + 3.375 = 8.375 ; C0 = 2*v2
    assert p.eval_constraints(x)[0] == pytest.approx(2 * 8.375)
    assert p.eval_objective(x) == pytest.approx(8.375)


def test_maximize_negated():
    txt = """g3 0 1 0
 1 0 1 0 0
 0 0
 0 0
 0 0 0
 0 0 0 1
 0 0 0 0 0
 0 1
 0 0
 0 0 0 0 0
O0 1
n0
b
0 0 5
G0 1
0 3
"""
    p = NlReader().read_string(txt, "maxneg")
    # max 3x -> min -3x
    assert p.eval_objective(np.array([2.0])) == pytest.approx(-6.0)
