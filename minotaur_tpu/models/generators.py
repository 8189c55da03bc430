"""Synthetic problem-family generators.

The reference's "models" are its optimization problem classes; this
module generates parameterized instances of the families named in the
benchmark plan (BASELINE.json configs: knapsack + bilinear examples) for
tests and throughput benchmarks.
"""

from __future__ import annotations

import numpy as np

from ..ir.functions import Function, LinearFunction, QuadraticFunction
from ..ir.problem import Problem
from ..utils.types import VarType


def quadratic_knapsack(n: int = 12, density: float = 0.3, seed: int = 0
                       ) -> Problem:
    """max value + pairwise synergies under a capacity row (nonconvex
    after min-conversion); global optimum via mglob."""
    rng = np.random.default_rng(seed)
    w = rng.integers(2, 10, size=n).astype(float)
    p = Problem(f"qknap{n}")
    for j in range(n):
        p.new_variable(0, 1, VarType.BINARY, f"x{j}")
    p.new_constraint(
        Function(lf=LinearFunction({j: w[j] for j in range(n)})),
        -np.inf, float(w.sum() * 0.5), "capacity")
    qf = QuadraticFunction()
    lf = LinearFunction()
    for j in range(n):
        lf.add_term(j, -float(rng.uniform(1, 5)))
        for k in range(j + 1, n):
            if rng.uniform() < density:
                qf.add_term(j, k, -float(rng.uniform(0.5, 2.0)))
    p.new_objective(Function(lf=lf, qf=qf))
    return p


def bilinear_pooling(n_pairs: int = 4, seed: int = 0) -> Problem:
    """min sum of bilinear terms over coupled simplices — a pooling-style
    nonconvex QCQP for the spatial-branching pipeline."""
    rng = np.random.default_rng(seed)
    p = Problem(f"bilin{n_pairs}")
    for j in range(2 * n_pairs):
        p.new_variable(0.0, 4.0, VarType.CONTINUOUS, f"x{j}")
    qf = QuadraticFunction()
    for t in range(n_pairs):
        i, j = 2 * t, 2 * t + 1
        qf.add_term(i, j, -float(rng.uniform(0.5, 1.5)))
        p.new_constraint(
            Function(lf=LinearFunction({i: 1.0, j: 1.0})),
            -np.inf, float(rng.uniform(3.0, 5.0)), f"cap{t}")
    p.new_objective(Function(qf=qf))
    return p


def convex_miqp(n_cont: int = 4, n_int: int = 4, seed: int = 0) -> Problem:
    """min ||x - a||^2 with integer coordinates on half the variables and
    a coupling budget row — a convex MIQP for mbnb/mqg/moa."""
    rng = np.random.default_rng(seed)
    n = n_cont + n_int
    a = rng.uniform(0.0, 8.0, size=n)
    p = Problem(f"cmiqp{n}")
    for j in range(n):
        vt = VarType.INTEGER if j >= n_cont else VarType.CONTINUOUS
        p.new_variable(0.0, 10.0, vt, f"x{j}")
    p.new_constraint(
        Function(lf=LinearFunction({j: 1.0 for j in range(n)})),
        -np.inf, float(a.sum() * 0.8), "budget")
    qf = QuadraticFunction()
    lf = LinearFunction()
    for j in range(n):
        qf.add_term(j, j, 1.0)
        lf.add_term(j, -2.0 * a[j])
    p.new_objective(Function(lf=lf, qf=qf), const=float(a @ a))
    return p
