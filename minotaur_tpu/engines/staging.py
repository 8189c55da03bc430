"""Stage a Problem into dense, device-ready arrays + callables.

This is the boundary between the mutable host IR and the functional device
world: everything the batched engines need is packed here once per
problem/relaxation, and per-node state is reduced to (vlb, vub) bound
vectors — the TPU translation of the reference's node-as-bound-mods design
(reference: Node.h:363-369, Serializer.h:32-35).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np

from ..ir.problem import Problem
from ..ops.stage import stage_scalar, stage_stack
from ..utils.types import INF


@dataclasses.dataclass
class StagedProblem:
    """Immutable dense view of a Problem for the batched engines.

    Constraint bodies are split: linear parts in A (m, n); quadratic parts
    as per-row dense Q matrices folded into `con_nl` (staged callables);
    nonlinear rows listed in `nl_rows`.  Objective = c.x + x'Qobj x +
    obj_nl(x) + obj_const.
    """

    name: str
    n: int
    m: int
    c: np.ndarray                       # (n,)
    obj_const: float
    Qobj: Optional[np.ndarray]          # (n, n) symmetric or None
    obj_nl: Optional[Callable]          # staged scalar fn or None
    A: np.ndarray                       # (m, n) linear parts
    clb: np.ndarray                     # (m,)
    cub: np.ndarray                     # (m,)
    vlb: np.ndarray                     # (n,) root bounds
    vub: np.ndarray                     # (n,)
    int_mask: np.ndarray                # (n,) bool
    nl_rows: np.ndarray                 # indices of rows with nl/quad bodies
    con_nl: Optional[Callable]          # x -> (len(nl_rows),) values
    nl_graphs: List                     # ExprGraphs (quadratic rows get one)

    # --------------------------------------------------------- properties
    @property
    def has_nl_objective(self) -> bool:
        return self.obj_nl is not None or self.Qobj is not None

    @property
    def is_lp_relaxable(self) -> bool:
        return len(self.nl_rows) == 0 and not self.has_nl_objective

    def objective_fn(self) -> Callable:
        """Staged objective (without the constant)."""
        import jax.numpy as jnp
        c = jnp.asarray(self.c)
        Q = jnp.asarray(self.Qobj) if self.Qobj is not None else None
        nl = self.obj_nl

        def f(x):
            val = c @ x
            if Q is not None:
                val = val + x @ (Q @ x)
            if nl is not None:
                val = val + nl(x)
            return val

        return f

    def constraint_fn(self) -> Callable:
        """Staged full constraint body g(x) -> (m,): linear + nonlinear."""
        import jax.numpy as jnp
        A = jnp.asarray(self.A)
        nl_rows = jnp.asarray(self.nl_rows)
        nl = self.con_nl

        def g(x):
            vals = A @ x
            if nl is not None and len(self.nl_rows):
                vals = vals.at[nl_rows].add(nl(x))
            return vals

        return g


def _quad_to_dense(qf, n: int) -> np.ndarray:
    """QuadraticFunction -> symmetric dense Q with x'Qx == qf(x)."""
    Q = np.zeros((n, n), dtype=np.float64)
    for (i, j), coef in qf.terms.items():
        if i == j:
            Q[i, i] += coef
        else:
            Q[i, j] += coef / 2.0
            Q[j, i] += coef / 2.0
    return Q


def stage_problem(p: Problem) -> StagedProblem:
    n, m = p.n_vars, p.n_cons
    vlb, vub = p.var_bounds()
    int_mask = np.zeros(n, dtype=bool)
    int_mask[p.int_indices()] = True

    A = np.zeros((m, n), dtype=np.float64)
    clb = np.empty(m)
    cub = np.empty(m)
    nl_rows: List[int] = []
    nl_graphs: List = []
    nl_fns: List[Callable] = []
    import jax.numpy as jnp

    for i, con in enumerate(p.cons):
        if con.fun.lf:
            for v, coef in con.fun.lf:
                A[i, v] = coef
        clb[i], cub[i] = con.lb, con.ub
        body_fns = []
        if con.fun.qf is not None and len(con.fun.qf):
            Q = _quad_to_dense(con.fun.qf, n)
            Qj = jnp.asarray(Q)
            body_fns.append(lambda x, Qj=Qj: x @ (Qj @ x))
            nl_graphs.append(con.fun.qf.to_expr_graph())
        elif con.fun.nlf is not None and con.fun.nlf.root >= 0:
            nl_graphs.append(con.fun.nlf)
        if con.fun.nlf is not None and con.fun.nlf.root >= 0:
            body_fns.append(stage_scalar(con.fun.nlf))
        if body_fns:
            nl_rows.append(i)
            if len(body_fns) == 1:
                nl_fns.append(body_fns[0])
            else:
                nl_fns.append(lambda x, fns=tuple(body_fns): sum(f(x) for f in fns))

    con_nl = None
    if nl_fns:
        def con_nl(x, fns=tuple(nl_fns)):  # noqa: F811
            return jnp.stack([f(x) for f in fns])

    c = np.zeros(n)
    obj_const = 0.0
    Qobj = None
    obj_nl = None
    if p.obj is not None:
        obj_const = p.obj.const
        if p.obj.fun.lf:
            for v, coef in p.obj.fun.lf:
                c[v] = coef
        if p.obj.fun.qf is not None and len(p.obj.fun.qf):
            Qobj = _quad_to_dense(p.obj.fun.qf, n)
        if p.obj.fun.nlf is not None and p.obj.fun.nlf.root >= 0:
            obj_nl = stage_scalar(p.obj.fun.nlf)

    return StagedProblem(
        name=p.name, n=n, m=m, c=c, obj_const=obj_const, Qobj=Qobj,
        obj_nl=obj_nl, A=A, clb=clb, cub=cub, vlb=vlb, vub=vub,
        int_mask=int_mask, nl_rows=np.asarray(nl_rows, dtype=np.int32),
        con_nl=con_nl, nl_graphs=nl_graphs,
    )
