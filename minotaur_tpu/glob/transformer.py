"""Reformulate an MIQCQP to term-separable standard form.

Reference: the Glob pipeline's transformer stage (Glob.cpp:107-130 ->
QuadTransformer / SimpleTransformer.cpp:921 reformulate): every quadratic
term x_i*x_j (or x_i^2) gets an auxiliary variable y_t with the defining
constraint y_t = x_i x_j, deduplicated across the problem (the YEq*
registries); the problem becomes linear over (x, y) plus the term
definitions, which the relaxation step outer-approximates (McCormick /
secant).  Convex quadratics are detected by eigenvalue check
(reference checkQuadConvexity_ :735 via LAPACK dsyevr -> numpy.linalg
.eigvalsh here) so the driver can forward them to QG (Glob.cpp:392-400).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ir.problem import Problem
from ..utils.types import INF, FunctionType


@dataclasses.dataclass
class GlobStaged:
    """Standard form over z = (x, y):  min c.z  s.t. A z in [clb, cub],
    vlb <= z <= vub,  y_t = x_{ti} * x_{tj} for each term t."""
    name: str
    n_x: int
    n_y: int
    c: np.ndarray                # (n_x + n_y,)
    obj_const: float
    A: np.ndarray                # (m, n_x + n_y)
    clb: np.ndarray
    cub: np.ndarray
    vlb: np.ndarray              # (n_x + n_y,) including aux bounds
    vub: np.ndarray
    int_mask: np.ndarray
    term_i: np.ndarray           # (n_y,) first factor
    term_j: np.ndarray           # (n_y,) second factor (== i for squares)

    @property
    def n(self) -> int:
        return self.n_x + self.n_y


def is_convex_quadratic(problem: Problem, tol: float = 1e-9) -> bool:
    """True if the objective quadratic is PSD and every quadratic
    constraint is one-sided-convex (<= with PSD or >= with NSD)."""
    from ..engines.staging import _quad_to_dense
    n = problem.n_vars

    def eigs(qf):
        return np.linalg.eigvalsh(_quad_to_dense(qf, n))

    if problem.obj and problem.obj.fun.qf and len(problem.obj.fun.qf):
        if eigs(problem.obj.fun.qf).min() < -tol:
            return False
    for c in problem.cons:
        if c.fun.nlf is not None and c.fun.nlf.root >= 0:
            return False  # general nonlinear: not classified here
        if c.fun.qf and len(c.fun.qf):
            ev = eigs(c.fun.qf)
            if c.lb > -INF and c.ub < INF:
                return False            # two-sided quadratic: nonconvex
            if c.ub < INF and ev.min() < -tol:
                return False
            if c.lb > -INF and ev.max() > tol:
                return False
    return True


def transform(problem: Problem) -> GlobStaged:
    """Build the (x, y) standard form.  Only quadratic nonlinearities are
    supported (the Glob MIQCQP pipeline); general expressions should go
    through mbnb/mmultistart."""
    n = problem.n_vars
    terms: Dict[Tuple[int, int], int] = {}   # (i, j) -> y index (YEq dedup)

    def y_index(i: int, j: int) -> int:
        key = (i, j) if i <= j else (j, i)
        if key not in terms:
            terms[key] = len(terms)
        return terms[key]

    # first pass: register terms
    rows_quads: List[Optional[Dict[Tuple[int, int], float]]] = []
    for c in problem.cons:
        if c.fun.nlf is not None and c.fun.nlf.root >= 0:
            raise ValueError(
                f"constraint {c.name}: general nonlinear bodies are not "
                "supported by the quadratic transformer")
        if c.fun.qf and len(c.fun.qf):
            for (i, j) in c.fun.qf.terms:
                y_index(i, j)
            rows_quads.append(dict(c.fun.qf.terms))
        else:
            rows_quads.append(None)
    obj_quads: Optional[Dict[Tuple[int, int], float]] = None
    if problem.obj:
        if problem.obj.fun.nlf is not None and problem.obj.fun.nlf.root >= 0:
            raise ValueError("objective: general nonlinear bodies are not "
                             "supported by the quadratic transformer")
        if problem.obj.fun.qf and len(problem.obj.fun.qf):
            obj_quads = dict(problem.obj.fun.qf.terms)
            for (i, j) in obj_quads:
                y_index(i, j)

    n_y = len(terms)
    nz = n + n_y
    m = problem.n_cons
    A = np.zeros((m, nz))
    clb = np.empty(m)
    cub = np.empty(m)
    for r, c in enumerate(problem.cons):
        if c.fun.lf:
            for v, co in c.fun.lf:
                A[r, v] = co
        if rows_quads[r]:
            for (i, j), co in rows_quads[r].items():
                A[r, n + terms[(i, j) if i <= j else (j, i)]] += co
        clb[r], cub[r] = c.lb, c.ub

    cvec = np.zeros(nz)
    obj_const = 0.0
    if problem.obj:
        obj_const = problem.obj.const
        if problem.obj.fun.lf:
            for v, co in problem.obj.fun.lf:
                cvec[v] = co
        if obj_quads:
            for (i, j), co in obj_quads.items():
                cvec[n + terms[(i, j) if i <= j else (j, i)]] += co

    xlb, xub = problem.var_bounds()
    term_i = np.empty(n_y, dtype=np.int32)
    term_j = np.empty(n_y, dtype=np.int32)
    for (i, j), t in terms.items():
        term_i[t] = i
        term_j[t] = j

    # initial aux bounds from interval products
    ylb = np.empty(n_y)
    yub = np.empty(n_y)
    for t in range(n_y):
        i, j = term_i[t], term_j[t]
        lo_i, hi_i = xlb[i], xub[i]
        lo_j, hi_j = xlb[j], xub[j]
        if i == j:
            lo = 0.0 if lo_i <= 0.0 <= hi_i else min(lo_i ** 2, hi_i ** 2)
            hi = max(lo_i ** 2, hi_i ** 2)
        else:
            prods = [lo_i * lo_j, lo_i * hi_j, hi_i * lo_j, hi_i * hi_j]
            prods = [0.0 if np.isnan(v) else v for v in prods]
            lo, hi = min(prods), max(prods)
        ylb[t] = lo
        yub[t] = hi

    int_mask = np.zeros(nz, dtype=bool)
    int_mask[problem.int_indices()] = True

    return GlobStaged(
        name=problem.name + "-glob", n_x=n, n_y=n_y, c=cvec,
        obj_const=obj_const, A=A, clb=clb, cub=cub,
        vlb=np.concatenate([xlb, ylb]), vub=np.concatenate([xub, yub]),
        int_mask=int_mask, term_i=term_i, term_j=term_j)
