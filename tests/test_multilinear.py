"""Trilinear lambda-hull formulation (MultilinearTermsHandler parity).

Reference analogue: MultilinearTermsHandler.{h,cpp} grouping-based
convex-hull relaxation of multilinear terms.  Here the hull is exact by
formulation (8 lambda columns per trilinear monomial, in-trace link
rows), so the root relaxation must dominate recursive McCormick.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from minotaur_tpu.glob.glob_bnb import GlobBranchAndBound
from minotaur_tpu.glob.transformer import transform
from minotaur_tpu.ir.expr import ExprGraph
from minotaur_tpu.ir.functions import Function, LinearFunction
from minotaur_tpu.ir.problem import Problem
from minotaur_tpu.ops.opcodes import Op
from minotaur_tpu.utils.environment import Environment


def _trilinear_problem():
    """min -x0*x1*x2 + 0.5*x0  s.t. x0 + x1 + x2 <= 2,  x in [0,1]^3.

    Optimum: by symmetry of the product under the simplex cap, best is
    x0=x1=x2=2/3 -> obj = -(8/27) + 1/3 = 0.037037... vs corner
    candidates; check numerically below.
    """
    p = Problem("tri")
    for _ in range(3):
        p.new_variable(0.0, 1.0)
    p.new_constraint(
        Function(lf=LinearFunction({0: 1.0, 1: 1.0, 2: 1.0})),
        -np.inf, 2.0)
    g = ExprGraph()
    t = g.node(Op.MULT, g.node(Op.MULT, g.var(0), g.var(1)), g.var(2))
    g.set_root(g.node(Op.UMINUS, t))
    p.new_objective(Function(lf=LinearFunction({0: 0.5}), nlf=g))
    return p


def test_transform_detects_trilinear():
    gs = transform(_trilinear_problem(), multilinear_hull=8)
    assert gs.n_t == 1
    assert sorted(gs.tri_vars[0]) == [0, 1, 2]
    # 8 lambda columns bounded [0, 1]
    lam0 = int(gs.tri_lam0[0])
    assert np.all(gs.vlb[lam0:lam0 + 8] == 0.0)
    assert np.all(gs.vub[lam0:lam0 + 8] == 1.0)
    # a static sum-to-1 row exists
    row = np.zeros(gs.n)
    row[lam0:lam0 + 8] = 1.0
    hit = [r for r in range(gs.A.shape[0])
           if np.allclose(gs.A[r], row) and gs.clb[r] == gs.cub[r] == 1.0]
    assert hit


def test_hull_exactness_at_lifts():
    """Every exact lift admits a feasible lambda (hull membership)."""
    gs = transform(_trilinear_problem(), multilinear_hull=8)
    from minotaur_tpu.glob.glob_step import GlobStepOptions, _EnvHolder, \
        build_glob_step
    hold = _EnvHolder()
    build_glob_step(gs, GlobStepOptions(), _env_out=hold)
    A, lb, ub = (np.asarray(v) for v in hold.tri_rows(gs.vlb, gs.vub))
    rng = np.random.default_rng(1)
    for _ in range(20):
        x = rng.uniform(0, 1, 3)
        # lambda = product of per-variable interpolation weights gives
        # the multilinear interpolation: check it satisfies the rows
        z = np.zeros(gs.n)
        z[:3] = x
        for t in range(gs.n_y):   # terms chain (y = (x0*x1)*x2)
            z[gs.term_y[t]] = z[gs.term_i[t]] * z[gs.term_j[t]]
        w = [(1 - x[i], x[i]) for i in range(3)]
        lam0 = int(gs.tri_lam0[0])
        for v in range(8):
            z[lam0 + v] = (w[0][(v >> 0) & 1] * w[1][(v >> 1) & 1] *
                           w[2][(v >> 2) & 1])
        act = A @ z
        assert np.allclose(act, 0.0, atol=1e-9)


def _gap_problem():
    """min -x0*x1*x2 + 0.2*x0 over x0 in [-1,2], x1 in [0,2],
    x2 in [-1,1], x0+x1+x2 <= 1.5 — a mixed-sign box where the vertex
    hull is strictly tighter than recursive McCormick (root LP bound
    -2.62 vs -3.19)."""
    p = Problem("trigap")
    for lo, hi in ((-1.0, 2.0), (0.0, 2.0), (-1.0, 1.0)):
        p.new_variable(lo, hi)
    p.new_constraint(
        Function(lf=LinearFunction({0: 1.0, 1: 1.0, 2: 1.0})),
        -np.inf, 1.5)
    g = ExprGraph()
    t = g.node(Op.MULT, g.node(Op.MULT, g.var(0), g.var(1)), g.var(2))
    g.set_root(g.node(Op.UMINUS, t))
    p.new_objective(Function(lf=LinearFunction({0: 0.2}), nlf=g))
    return p


def test_hull_tightens_root_and_global_solve():
    roots = {}
    for hull in (0, 8):
        env = Environment()
        env.set_option("node_batch", 8)
        env.set_option("bnb_node_limit", 1)
        env.set_option("bnb_time_limit", 120)
        env.set_option("log_level", 1)
        env.set_option("rlt_cuts", 0)
        env.set_option("multilinear_hull", hull)
        bab = GlobBranchAndBound(_gap_problem(), env)
        bab.solve()
        roots[hull] = bab.lb
    # strict tightening on the mixed-sign box (0.57 gap measured)
    assert roots[8] >= roots[0] + 0.3

    p = _trilinear_problem()

    env = Environment()
    env.set_option("node_batch", 8)
    env.set_option("bnb_node_limit", 3000)
    env.set_option("bnb_time_limit", 180)
    env.set_option("log_level", 1)
    env.set_option("solRel_tol", 1e-5)
    env.set_option("multilinear_hull", 8)
    bab = GlobBranchAndBound(p, env)
    bab.solve()
    # reference optimum by fine grid (done offline): the hull solve must
    # match the best of a dense sample to 1e-3
    best = np.inf
    for a in np.linspace(0, 1, 41):
        for b in np.linspace(0, 1, 41):
            c = min(1.0, 2.0 - a - b)
            if c < 0:
                continue
            best = min(best, -a * b * c + 0.5 * a)
    assert bab.ub <= best + 1e-3
    assert bab.lb >= bab.ub - max(1e-4, 1e-4 * abs(bab.ub))


def _quadlinear_problem():
    """min -x0*x1*x2*x3 + 0.25*x0  s.t. sum x <= 3,  x in [0,1]^4."""
    p = Problem("quad4")
    for _ in range(4):
        p.new_variable(0.0, 1.0)
    p.new_constraint(
        Function(lf=LinearFunction({0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0})),
        -np.inf, 3.0)
    g = ExprGraph()
    t = g.node(Op.MULT,
               g.node(Op.MULT, g.var(0), g.var(1)),
               g.node(Op.MULT, g.var(2), g.var(3)))
    g.set_root(g.node(Op.UMINUS, t))
    p.new_objective(Function(lf=LinearFunction({0: 0.25}), nlf=g))
    return p


def test_transform_detects_quadlinear():
    """Arity-4 grouping (general ml_* analogue): 16 lambda columns with a
    static sum-to-1 row."""
    gs = transform(_quadlinear_problem(), multilinear_hull=8)
    assert gs.n_q == 1
    assert sorted(gs.quad_vars[0]) == [0, 1, 2, 3]
    lam0 = int(gs.quad_lam0[0])
    assert np.all(gs.vlb[lam0:lam0 + 16] == 0.0)
    assert np.all(gs.vub[lam0:lam0 + 16] == 1.0)
    row = np.zeros(gs.n)
    row[lam0:lam0 + 16] = 1.0
    hit = [r for r in range(gs.A.shape[0])
           if np.allclose(gs.A[r], row) and gs.clb[r] == gs.cub[r] == 1.0]
    assert hit


def test_quadlinear_hull_membership_and_solve():
    """The 16-vertex hull admits every exact lift, and the glob driver
    solves the 4-linear model to its global optimum with the hull on."""
    import jax.numpy as jnp
    from minotaur_tpu.glob.glob_step import GlobStepOptions, _EnvHolder, \
        build_glob_step
    gs = transform(_quadlinear_problem(), multilinear_hull=8)
    env_out = _EnvHolder()
    build_glob_step(gs, GlobStepOptions(), _env_out=env_out)
    qA, qlb, qub = (np.asarray(a) for a in env_out.quad_rows(
        jnp.asarray(gs.vlb), jnp.asarray(gs.vub)))
    assert qA.shape[0] == 5
    # at the vertex x = (1,1,1,0): lambda on that vertex index satisfies
    # all 5 link rows exactly
    x = np.zeros(gs.n)
    xv = [1.0, 1.0, 1.0, 0.0]
    for i, v in enumerate(xv):
        x[gs.quad_vars[0][i]] = v
    x[int(gs.quad_y[0])] = np.prod(xv)
    vtx = sum((1 << i) for i, v in enumerate(xv) if v > 0.5)
    x[int(gs.quad_lam0[0]) + vtx] = 1.0
    np.testing.assert_allclose(qA @ x, 0.0, atol=1e-12)

    # global solve: optimum of min -prod(x) + 0.25 x0 over sum x <= 3 is
    # at x = (1, 1, u, v) frontier; numeric scan says obj* = -0.5625 at
    # x0 = 1? -- assert against a fine grid scan instead of guessing
    best = np.inf
    for a in np.linspace(0, 1, 21):
        for b in np.linspace(0, 1, 21):
            for c in np.linspace(0, 1, 21):
                d = min(1.0, 3.0 - a - b - c)
                if d < 0:
                    continue
                best = min(best, -(a * b * c * d) + 0.25 * a)
    env = Environment()
    env.set_option("node_batch", 16)
    env.set_option("bnb_node_limit", 4000)
    env.set_option("bnb_time_limit", 120)
    env.set_option("log_level", 1)
    env.set_option("multilinear_hull", 8)
    bab = GlobBranchAndBound(_quadlinear_problem(), env)
    bab.solve()
    assert bab.ub <= best + 1e-4
    assert bab.lb >= bab.ub - 1e-3 - 1e-6 * abs(bab.ub)


def _pentalinear_problem():
    """min -x0*x1*x2*x3*x4 + 0.3*x0 over a mixed-sign box with a
    simplex cap — arity 5 exceeds the hull group cap (4), so the term
    chains a grouped arity-4 hull intermediate plus one McCormick
    link."""
    p = Problem("penta")
    for lo, hi in ((-1.0, 2.0), (0.0, 2.0), (-1.0, 1.0), (0.0, 1.5),
                   (0.5, 1.5)):
        p.new_variable(lo, hi)
    p.new_constraint(
        Function(lf=LinearFunction({i: 1.0 for i in range(5)})),
        -np.inf, 3.0)
    g = ExprGraph()
    t = g.var(0)
    for i in range(1, 5):
        t = g.node(Op.MULT, t, g.var(i))
    g.set_root(g.node(Op.UMINUS, t))
    p.new_objective(Function(lf=LinearFunction({0: 0.3}), nlf=g))
    return p


def test_grouped_hull_dominates_mccormick_on_arity5():
    """A 5-linear monomial's root bound with grouped lambda hulls
    (multilinear_group=4: the arity-3 and arity-4 INTERMEDIATES of the
    chain get exact hulls) dominates the pure recursive-McCormick
    chain — the reference's ml_* grouping claim
    (MultilinearTermsHandler.cpp)."""
    from minotaur_tpu.glob.transformer import transform as _tf
    # structural: the chain's intermediates are grouped into hulls
    gs = _tf(_pentalinear_problem(), multilinear_hull=8,
             multilinear_group=4)
    assert gs.n_t >= 1 and gs.n_q >= 1     # arity-3 + arity-4 groups
    # group cap respected: no hull spans more than 4 factors
    gs3 = _tf(_pentalinear_problem(), multilinear_hull=8,
              multilinear_group=3)
    assert gs3.n_q == 0 and gs3.n_t >= 1   # cap 3 -> trilinear only

    roots = {}
    for hull in (0, 8):
        env = Environment()
        env.set_option("node_batch", 8)
        env.set_option("bnb_node_limit", 1)
        env.set_option("bnb_time_limit", 180)
        env.set_option("log_level", 1)
        env.set_option("rlt_cuts", 0)
        env.set_option("multilinear_hull", hull)
        bab = GlobBranchAndBound(_pentalinear_problem(), env)
        bab.solve()
        roots[hull] = bab.lb
    assert roots[8] >= roots[0] + 1e-6, roots
