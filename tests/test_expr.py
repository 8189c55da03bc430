"""Staged evaluation + AD + interval tests.

Reference analogue: CGraphUT (AD correctness on hand-built DAGs) — here we
additionally property-test against numpy evaluation and finite differences
across every shipped instance, and check interval soundness by sampling.
"""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minotaur_tpu.io.nl_reader import read_nl
from minotaur_tpu.ir.expr import ExprGraph
from minotaur_tpu.ops.opcodes import Op
from minotaur_tpu.ops.interval import linear_fbbt, stage_fbbt, stage_interval
from minotaur_tpu.ops.stage import stage_scalar

from conftest import REF_INSTANCES, REF_TEST_INSTANCES

NL_WITH_NONLINEAR = ["allfuns.nl", "hess.nl", "luedtke-1.nl", "poly.nl",
                     "minlp_eg0.nl"]


def _graphs(path):
    p = read_nl(path, extract_quadratics=False)
    gs = [c.fun.nlf for c in p.cons if c.fun.nlf is not None]
    if p.obj and p.obj.fun.nlf is not None:
        gs.append(p.obj.fun.nlf)
    return p, gs


@pytest.mark.parametrize("fname", NL_WITH_NONLINEAR)
def test_staged_eval_matches_numpy(fname):
    p, gs = _graphs(os.path.join(REF_INSTANCES, fname))
    rng = np.random.default_rng(0)
    for g in gs:
        f = jax.jit(stage_scalar(g))
        for _ in range(3):
            x = rng.uniform(0.6, 1.4, p.n_vars)
            ref = g.eval_np(x)
            got = float(f(jnp.asarray(x)))
            assert got == pytest.approx(ref, rel=1e-10, abs=1e-12), fname


@pytest.mark.parametrize("fname", ["hess.nl", "minlp_eg0.nl", "luedtke-1.nl"])
def test_gradients_match_finite_differences(fname):
    p, gs = _graphs(os.path.join(REF_INSTANCES, fname))
    rng = np.random.default_rng(1)
    for g in gs:
        f = stage_scalar(g)
        grad = jax.jit(jax.grad(f))
        x = rng.uniform(0.7, 1.3, p.n_vars)
        ga = np.asarray(grad(jnp.asarray(x)))
        h = 1e-6
        for j in g.vars_used():
            xp, xm = x.copy(), x.copy()
            xp[j] += h
            xm[j] -= h
            fd = (g.eval_np(xp) - g.eval_np(xm)) / (2 * h)
            assert ga[j] == pytest.approx(fd, rel=1e-4, abs=1e-6), (fname, j)


def test_hessian_quadratic_exact():
    g = ExprGraph()
    # f = 3 x0^2 + 2 x0 x1 + x1^2
    t1 = g.node(Op.MULT, g.num(3.0), g.node(Op.SQR, g.var(0)))
    t2 = g.node(Op.MULT, g.num(2.0), g.node(Op.MULT, g.var(0), g.var(1)))
    t3 = g.node(Op.SQR, g.var(1))
    g.set_root(g.sum_list([t1, t2, t3]))
    f = stage_scalar(g)
    H = jax.hessian(f)(jnp.array([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(H), [[6.0, 2.0], [2.0, 2.0]])


def test_vmap_eval():
    g = ExprGraph()
    g.set_root(g.node(Op.MULT, g.node(Op.SQRT, g.var(0)), g.var(1)))
    f = jax.jit(jax.vmap(stage_scalar(g)))
    xs = jnp.array([[4.0, 2.0], [9.0, 3.0], [16.0, 0.5]])
    np.testing.assert_allclose(np.asarray(f(xs)), [4.0, 9.0, 2.0])


# ------------------------------------------------------------- intervals
def _sample_check_forward(g, n_vars, xlo, xhi, n_samples=200, seed=0):
    f_int = stage_interval(g)
    lo, hi = f_int(jnp.asarray(xlo), jnp.asarray(xhi))
    lo, hi = float(lo), float(hi)
    rng = np.random.default_rng(seed)
    for _ in range(n_samples):
        x = rng.uniform(xlo, xhi)
        v = g.eval_np(x)
        if np.isfinite(v):
            assert lo - 1e-7 - 1e-7 * abs(v) <= v <= hi + 1e-7 + 1e-7 * abs(v)


@pytest.mark.parametrize("fname", NL_WITH_NONLINEAR)
def test_interval_forward_sound(fname):
    p, gs = _graphs(os.path.join(REF_INSTANCES, fname))
    lb, ub = p.var_bounds()
    xlo = np.where(np.isfinite(lb), lb, 0.25)
    xhi = np.where(np.isfinite(ub), np.minimum(ub, xlo + 2.0), xlo + 2.0)
    for g in gs:
        _sample_check_forward(g, p.n_vars, xlo, xhi)


def test_fbbt_tightens_and_keeps_feasible_points():
    # constraint: sqrt(x0) + x1^2 <= 2, x0 in [0, 100], x1 in [-10, 10]
    g = ExprGraph()
    g.set_root(g.node(Op.PLUS, g.node(Op.SQRT, g.var(0)),
                      g.node(Op.SQR, g.var(1))))
    f = jax.jit(stage_fbbt(g, 2))
    xlo = jnp.array([0.0, -10.0])
    xhi = jnp.array([100.0, 10.0])
    nlo, nhi, infeas = f(xlo, xhi, jnp.asarray(-np.inf), jnp.asarray(2.0))
    assert not bool(infeas)
    nlo, nhi = np.asarray(nlo), np.asarray(nhi)
    # sqrt(x0) <= 2 -> x0 <= 4 ; x1^2 <= 2 -> |x1| <= sqrt(2)
    assert nhi[0] == pytest.approx(4.0)
    assert nhi[1] == pytest.approx(np.sqrt(2.0))
    assert nlo[1] == pytest.approx(-np.sqrt(2.0))
    # soundness: feasible points stay inside
    rng = np.random.default_rng(3)
    for _ in range(500):
        x = rng.uniform([0, -10], [100, 10])
        if g.eval_np(x) <= 2.0:
            assert np.all(x >= nlo - 1e-9) and np.all(x <= nhi + 1e-9)


def test_fbbt_detects_infeasible():
    # x0^2 >= 5 with x0 in [0, 2] is infeasible
    g = ExprGraph()
    g.set_root(g.node(Op.SQR, g.var(0)))
    f = stage_fbbt(g, 1)
    _, _, infeas = f(jnp.array([0.0]), jnp.array([2.0]),
                     jnp.asarray(5.0), jnp.asarray(np.inf))
    assert bool(infeas)


def test_linear_fbbt():
    # x0 + x1 <= 4, x0 - x1 = 1, x in [0,10]^2
    A = jnp.array([[1.0, 1.0], [1.0, -1.0]])
    rlo = jnp.array([-np.inf, 1.0])
    rhi = jnp.array([4.0, 1.0])
    xlo = jnp.array([0.0, 0.0])
    xhi = jnp.array([10.0, 10.0])
    nlo, nhi, infeas = jax.jit(linear_fbbt)(A, rlo, rhi, xlo, xhi)
    assert not bool(infeas)
    # x1 = x0 - 1 >= -1 -> x1 in [0, ...]; x0 = 1 + x1 >= 1
    # x0 + x1 <= 4 & x0 = x1+1 -> x0 <= 4, x1 <= 3 (single sweep: <= 4-0=4)
    nlo, nhi = np.asarray(nlo), np.asarray(nhi)
    assert nlo[0] >= 1.0 - 1e-9
    assert nhi[0] <= 4.0 + 1e-9
    assert nhi[1] <= 4.0 + 1e-9


def test_linear_fbbt_batch_vmap():
    A = jnp.array([[1.0, 2.0]])
    rlo = jnp.array([-np.inf])
    rhi = jnp.array([4.0])
    xlos = jnp.zeros((5, 2))
    xhis = jnp.tile(jnp.array([10.0, 10.0]), (5, 1))
    f = jax.vmap(lambda lo, hi: linear_fbbt(A, rlo, rhi, lo, hi))
    nlo, nhi, infeas = f(xlos, xhis)
    assert nhi.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(nhi)[:, 0], 4.0)
    np.testing.assert_allclose(np.asarray(nhi)[:, 1], 2.0)
