"""Root presolve: FBBT fixpoint + optional OBBT.

Reference: Presolver.{h,cpp} (round-robin handler presolve with a
convergence test, Presolver.cpp:91-146; debug_sol oracle :160-166) and the
OBBT in QuadHandler::tightenLP_ (QuadHandler.cpp:2218), which solves 2n
bound LPs one at a time.  Here OBBT solves ALL 2n LPs in a single vmapped
device call with per-lane +/- e_j objectives — the batched-objective
engine makes the reference's most expensive root routine one dispatch.
Bounds from OBBT use the engine's *certified* dual bounds, so tightening
is sound even on unconverged lanes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..engines.ipm import IPMOptions, build_single_solver
from ..engines.staging import StagedProblem
from ..ir.problem import Problem
from ..utils.types import SolveStatus
from .step import build_fbbt_sweep

_INF = float("inf")


@dataclasses.dataclass
class PresolveStats:
    rounds: int = 0
    bounds_tightened: int = 0
    obbt_tightened: int = 0
    infeasible: bool = False


class Presolver:
    def __init__(self, problem: Problem, sp: StagedProblem,
                 max_iters: int = 5, int_tol: float = 1e-6,
                 ipm: IPMOptions = IPMOptions()):
        import jax
        self.problem = problem
        self.sp = sp
        self.max_iters = max_iters
        self.stats = PresolveStats()
        sweep = build_fbbt_sweep(sp, int_tol)

        def run(A, clb, cub, vlb, vub):
            infeas = np.asarray(False)
            import jax.numpy as jnp
            infeas = jnp.asarray(False)
            for _ in range(2):  # two sweeps per device call
                vlb, vub, infeas = sweep(A, clb, cub, vlb, vub, infeas)
            return vlb, vub, infeas

        self._sweep2 = jax.jit(run)
        self._ipm = ipm
        self._obbt_solver = None

    # ------------------------------------------------------------- FBBT
    def presolve(self, vlb: np.ndarray, vub: np.ndarray
                 ) -> Tuple[SolveStatus, np.ndarray, np.ndarray]:
        """FBBT to fixpoint (<= max_iters rounds of two sweeps)."""
        sp = self.sp
        for _ in range(self.max_iters):
            nlo, nhi, infeas = self._sweep2(sp.A, sp.clb, sp.cub, vlb, vub)
            nlo, nhi = np.asarray(nlo), np.asarray(nhi)
            if bool(infeas):
                self.stats.infeasible = True
                return SolveStatus.SOLVED_INFEASIBLE, vlb, vub
            changed = np.sum(nlo > vlb + 1e-9) + np.sum(nhi < vub - 1e-9)
            self.stats.rounds += 1
            self.stats.bounds_tightened += int(changed)
            vlb, vub = nlo, nhi
            if changed == 0:
                break
            if self.problem.debug_sol is not None and \
                    not np.all((self.problem.debug_sol >= vlb - 1e-6) &
                               (self.problem.debug_sol <= vub + 1e-6)):
                raise AssertionError(
                    "presolve cut off the debug solution (FBBT bug)")
        return SolveStatus.FINISHED, vlb, vub

    # ------------------------------------------------------------- OBBT
    def obbt(self, vlb: np.ndarray, vub: np.ndarray
             ) -> Tuple[np.ndarray, np.ndarray]:
        """Optimality-based bound tightening over the LINEAR relaxation:
        min/max each variable subject to linear rows + (optionally) the
        objective-cutoff row.  One vmapped solve of 2n LPs."""
        import jax
        sp = self.sp
        n = sp.n
        if self._obbt_solver is None:
            # linear-only staged view: nonlinear rows vacuous
            lin = dataclasses.replace(
                sp, Qobj=None, obj_nl=None, con_nl=None, nl_graphs=[],
                nl_rows=np.zeros(0, np.int32),
                clb=sp.clb.copy(), cub=sp.cub.copy())
            for r in sp.nl_rows:
                lin.clb[r] = -_INF
                lin.cub[r] = _INF
            impl = build_single_solver(lin, self._ipm).with_objective
            self._obbt_solver = (lin, jax.jit(jax.vmap(
                impl, in_axes=(None, None, None, None, None, 0, 0))))
        lin, solver = self._obbt_solver
        cs = np.zeros((2 * n, n))
        cs[np.arange(n), np.arange(n)] = 1.0       # min x_j
        cs[n + np.arange(n), np.arange(n)] = -1.0  # min -x_j = max x_j
        x0 = np.zeros((2 * n, n))
        res = solver(lin.A, lin.clb, lin.cub, vlb, vub, x0, cs)
        db = np.asarray(res.dual_bound)  # certified lower bounds
        new_lo = np.maximum(vlb, db[:n] - lin.obj_const - 1e-9)
        new_hi = np.minimum(vub, -(db[n:] - lin.obj_const) + 1e-9)
        ok = new_lo <= new_hi + 1e-9
        new_lo = np.where(ok, new_lo, vlb)
        new_hi = np.where(ok, new_hi, vub)
        self.stats.obbt_tightened += int(
            np.sum(new_lo > vlb + 1e-7) + np.sum(new_hi < vub - 1e-7))
        if self.problem.debug_sol is not None and \
                not np.all((self.problem.debug_sol >= new_lo - 1e-6) &
                           (self.problem.debug_sol <= new_hi + 1e-6)):
            raise AssertionError("OBBT cut off the debug solution")
        return new_lo, new_hi
