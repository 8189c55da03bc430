"""Monomial/polynomial algebra tests (reference: PolynomialFunction UT /
PolyUT + the TransPoly extraction direction)."""

import os

import numpy as np
import pytest

from minotaur_tpu.ir.polynomial import PolynomialFunction, \
    expr_to_polynomial
from minotaur_tpu.ir.expr import ExprGraph
from minotaur_tpu.ops.opcodes import Op

from conftest import REF_INSTANCES


def test_algebra_golden():
    x = PolynomialFunction.variable(0)
    y = PolynomialFunction.variable(1)
    p = (x + y) * (x - y)            # x^2 - y^2
    assert p.degree() == 2
    assert len(p) == 2
    pt = np.array([3.0, 2.0])
    assert p.eval(pt) == pytest.approx(5.0)
    q = (x + 1.0).power(3)           # x^3 + 3x^2 + 3x + 1
    assert q.degree() == 3
    assert q.eval(np.array([2.0])) == pytest.approx(27.0)
    assert q.const == pytest.approx(1.0)
    r = x * y * x                    # x^2 y
    assert list(r.terms) == [((0, 2), (1, 1))]


def test_to_expr_graph_roundtrip():
    x = PolynomialFunction.variable(0)
    y = PolynomialFunction.variable(1)
    p = 2.0 * x.power(3) * y - 4.0 * y.power(2) + x + 7.0
    g = p.to_expr_graph()
    rng = np.random.default_rng(0)
    for _ in range(10):
        pt = rng.uniform(-2, 2, size=2)
        assert g.eval_np(pt) == pytest.approx(p.eval(pt), rel=1e-12)
    # and extraction recovers the same polynomial
    p2 = expr_to_polynomial(g)
    assert p2 is not None
    assert p2.terms.keys() == p.terms.keys()
    for k in p.terms:
        assert p2.terms[k] == pytest.approx(p.terms[k])
    assert p2.const == pytest.approx(p.const)


def test_extraction_rejects_nonpoly():
    g = ExprGraph()
    g.set_root(g.node(Op.EXP, g.var(0)))
    assert expr_to_polynomial(g) is None
    g2 = ExprGraph()
    g2.set_root(g2.node(Op.DIV, g2.num(1.0), g2.var(0)))  # 1/x
    assert expr_to_polynomial(g2) is None


def test_extraction_on_poly_instance():
    from minotaur_tpu.io.nl_reader import read_nl
    p = read_nl(os.path.join(REF_INSTANCES, "poly.nl"),
                extract_quadratics=False)
    rng = np.random.default_rng(1)
    graphs = [c.fun.nlf for c in p.cons
              if c.fun.nlf is not None and c.fun.nlf.root >= 0]
    if p.obj and p.obj.fun.nlf is not None and p.obj.fun.nlf.root >= 0:
        graphs.append(p.obj.fun.nlf)
    assert graphs
    n_extracted = 0
    for g in graphs:
        poly = expr_to_polynomial(g)
        if poly is None:
            continue
        n_extracted += 1
        for _ in range(5):
            pt = rng.uniform(-1.5, 1.5, size=p.n_vars)
            assert poly.eval(pt) == pytest.approx(g.eval_np(pt),
                                                  rel=1e-9, abs=1e-9)
    assert n_extracted >= 1
