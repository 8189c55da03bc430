"""The fused B&B node superstep: FBBT -> IPM solve -> integrality analysis.

One jitted device program processes a whole batch of nodes.  This is the
TPU translation of the reference's per-node pipeline
(PCBProcessor::process PCBProcessor.cpp:178: presolveNode_ -> Engine::solve
-> isFeasible_ -> branching candidates), flattened into straight-line
batched array code.  Dispatch latency through the device tunnel is ~30 ms,
so everything a node needs must happen in ONE call.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional

import numpy as np

from ..engines.ipm import IPMOptions, build_single_solver
from ..engines.staging import StagedProblem
from ..ops.interval import linear_fbbt, stage_fbbt, stage_interval


class StepResult(NamedTuple):
    status: "jnp.ndarray"       # (B,) EngineStatus
    obj: "jnp.ndarray"          # (B,) relaxation objective
    dual_bound: "jnp.ndarray"   # (B,) certified node lower bound
    x: "jnp.ndarray"            # (B, n)
    int_feasible: "jnp.ndarray" # (B,) bool: all int vars integral
    branch_var: "jnp.ndarray"   # (B,) most-fractional int var (-1 if none)
    branch_val: "jnp.ndarray"   # (B,) value of x at branch_var
    max_frac: "jnp.ndarray"     # (B,)
    new_vlb: "jnp.ndarray"      # (B, n) FBBT-tightened bounds
    new_vub: "jnp.ndarray"      # (B, n)
    fbbt_infeas: "jnp.ndarray"  # (B,) bool
    frac: "jnp.ndarray"         # (B, n) fractionality per var (0 for cont)
    y: "jnp.ndarray"            # (B, m) row duals (for rc fixing/cuts)
    kkt_err: "jnp.ndarray"      # (B,) engine KKT error (acceptable-level
                                # decisions, reference Ipopt acceptable_tol)
    iters: "jnp.ndarray"        # (B,) engine iterations (profiling / warm-
                                # start diagnostics)


@dataclasses.dataclass(frozen=True)
class StepOptions:
    int_tol: float = 1e-6
    fbbt_rounds: int = 2
    ipm: IPMOptions = IPMOptions()


def build_fbbt_sweep(sp: StagedProblem, int_tol: float = 1e-6) -> Callable:
    """Returns the traceable single-lane sweep
    fbbt_round(A, clb, cub, vlb, vub, infeas) -> (vlb, vub, infeas):
    one vectorized linear-row pass + per-graph interval projection +
    integer rounding.  Used by the node superstep and the root Presolver."""
    import jax.numpy as jnp

    n = sp.n
    int_mask = jnp.asarray(sp.int_mask)
    has_ints = bool(sp.int_mask.any())

    # staged FBBT for nonlinear rows (quadratic rows have graphs too)
    nl_fbbt = [stage_fbbt(g, n) for g in sp.nl_graphs]
    nl_fwd = [stage_interval(g) for g in sp.nl_graphs]
    nl_rows = [int(r) for r in sp.nl_rows]

    def fbbt_round(A, clb, cub, vlb, vub, infeas):
        # forward intervals of nonlinear bodies -> tightened linear ranges
        if nl_rows:
            gmin = []
            gmax = []
            for f in nl_fwd:
                lo, hi = f(vlb, vub)
                gmin.append(lo)
                gmax.append(hi)
            gmin = jnp.stack(gmin)
            gmax = jnp.stack(gmax)
            rlo = clb.at[jnp.asarray(nl_rows)].add(-gmax)
            rhi = cub.at[jnp.asarray(nl_rows)].add(-gmin)
            rlo = jnp.where(jnp.isnan(rlo), -jnp.inf, rlo)
            rhi = jnp.where(jnp.isnan(rhi), jnp.inf, rhi)
        else:
            rlo, rhi = clb, cub
        vlb, vub, bad = linear_fbbt(A, rlo, rhi, vlb, vub)
        infeas = infeas | bad

        # nonlinear rows: impose [clb - linpart, cub - linpart] on the DAG
        if nl_rows:
            pos = jnp.maximum(A, 0.0)
            neg = jnp.minimum(A, 0.0)
            lmin = pos @ vlb + neg @ vub
            lmax = pos @ vub + neg @ vlb
            for f, r in zip(nl_fbbt, nl_rows):
                glo = clb[r] - lmax[r]
                ghi = cub[r] - lmin[r]
                glo = jnp.where(jnp.isnan(glo), -jnp.inf, glo)
                ghi = jnp.where(jnp.isnan(ghi), jnp.inf, ghi)
                vlb, vub, bad = f(vlb, vub, glo, ghi)
                infeas = infeas | bad

        # integer rounding (reference: LinearHandler intRounding :415)
        if has_ints:
            vlb = jnp.where(int_mask, jnp.ceil(vlb - int_tol), vlb)
            vub = jnp.where(int_mask, jnp.floor(vub + int_tol), vub)
            infeas = infeas | jnp.any(vlb > vub + 1e-9)
        return vlb, vub, infeas

    return fbbt_round


def build_node_step_unjitted(sp: StagedProblem,
                             opts: StepOptions = StepOptions()) -> Callable:
    """Returns the traceable single-lane step_one(A, clb, cub, vlb, vub,
    x0) -> StepResult for embedding into larger programs (sharded pools)."""
    import jax
    import jax.numpy as jnp

    n = sp.n
    solve_one = build_single_solver(sp, opts.ipm)
    int_mask = jnp.asarray(sp.int_mask)
    has_ints = bool(sp.int_mask.any())
    fbbt_round = build_fbbt_sweep(sp, opts.int_tol)

    def step_one(A, clb, cub, vlb, vub, x0, y0=None):
        infeas = jnp.asarray(False)
        for _ in range(opts.fbbt_rounds):
            vlb, vub, infeas = fbbt_round(A, clb, cub, vlb, vub, infeas)
        # keep the box sane for the solver even if infeasible (masked later)
        svlb = jnp.where(vlb > vub, vub, vlb)
        res = solve_one(A, clb, cub, svlb, vub, x0, y0)

        if has_ints:
            frac = jnp.where(int_mask,
                             jnp.abs(res.x - jnp.round(res.x)), 0.0)
            # fractionality only meaningful where the var is not fixed
            max_frac = jnp.max(frac)
            bvar = jnp.argmax(frac).astype(jnp.int32)
            int_feas = max_frac <= opts.int_tol
            bvar = jnp.where(int_feas, -1, bvar)
        else:
            frac = jnp.zeros(n)
            max_frac = jnp.asarray(0.0)
            bvar = jnp.asarray(-1, dtype=jnp.int32)
            int_feas = jnp.asarray(True)

        from ..utils.types import EngineStatus
        status = jnp.where(infeas,
                           jnp.asarray(int(EngineStatus.SOLVED_INFEASIBLE),
                                       dtype=jnp.int32),
                           res.status)
        db = jnp.where(infeas, 1e20, res.dual_bound)
        return StepResult(
            status=status, obj=res.obj, dual_bound=db, x=res.x,
            int_feasible=int_feas & ~infeas, branch_var=bvar,
            branch_val=res.x[jnp.maximum(bvar, 0)], max_frac=max_frac,
            new_vlb=vlb, new_vub=vub, fbbt_infeas=infeas, frac=frac,
            y=res.y, kkt_err=res.kkt_err, iters=res.iters)

    return step_one


def pack_step_result(jnp, res: StepResult) -> "jnp.ndarray":
    """Flatten a batched StepResult into ONE (B, 4n+m+10) f64 array inside
    the jitted program.  Device->host transfers through the TPU tunnel
    cost ~0.1-0.25 s of latency EACH (measured: 16 per-field fetches ate
    more wall time than the solve itself), so the driver fetches exactly
    one array per superstep and unpacks host-side."""
    scalars = [res.status, res.obj, res.dual_bound, res.int_feasible,
               res.branch_var, res.branch_val, res.max_frac,
               res.fbbt_infeas, res.kkt_err, res.iters]
    cols = [jnp.stack([s.astype(jnp.float64) for s in scalars], axis=1),
            res.x, res.new_vlb, res.new_vub, res.frac, res.y]
    return jnp.concatenate(cols, axis=1)


def unpack_step_result(arr: np.ndarray, n: int, m: int) -> StepResult:
    """Host-side inverse of pack_step_result (numpy views, zero copy)."""
    s = arr[:, :10]
    o = 10
    x = arr[:, o:o + n]; o += n
    nvlb = arr[:, o:o + n]; o += n
    nvub = arr[:, o:o + n]; o += n
    frac = arr[:, o:o + n]; o += n
    y = arr[:, o:o + m]; o += m
    return StepResult(
        status=s[:, 0].astype(np.int32), obj=s[:, 1], dual_bound=s[:, 2],
        x=x, int_feasible=s[:, 3] > 0.5,
        branch_var=s[:, 4].astype(np.int32), branch_val=s[:, 5],
        max_frac=s[:, 6], new_vlb=nvlb, new_vub=nvub,
        fbbt_infeas=s[:, 7] > 0.5, frac=frac, y=y, kkt_err=s[:, 8],
        iters=s[:, 9].astype(np.int32))


def build_node_step(sp: StagedProblem, opts: StepOptions = StepOptions()
                    ) -> Callable:
    """Returns step(A, clb, cub, vlb_b, vub_b, x0_b, y0_b) -> StepResult
    with HOST (numpy) leaves; A/clb/cub traced so cut updates never
    recompile.  The jitted program packs all outputs into one array so
    the superstep costs exactly one device->host transfer."""
    import jax
    import jax.numpy as jnp

    step_one = build_node_step_unjitted(sp, opts)

    @functools.partial(jax.jit)
    def step_packed(A, clb, cub, vlb_b, vub_b, x0_b, y0_b):
        res = jax.vmap(step_one, in_axes=(None, None, None, 0, 0, 0, 0))(
            A, clb, cub, vlb_b, vub_b, x0_b, y0_b)
        return pack_step_result(jnp, res)

    n, m = sp.n, sp.m

    def step(A, clb, cub, vlb_b, vub_b, x0_b, y0_b):
        packed = step_packed(A, clb, cub, vlb_b, vub_b, x0_b, y0_b)
        return unpack_step_result(np.asarray(packed), n, m)

    # async surface for the pipelined driver: dispatch returns the device
    # array immediately (XLA runs it asynchronously); unpack blocks on the
    # one d2h transfer.  Host bookkeeping of batch k overlaps device
    # compute of batch k+1.
    step.dispatch = step_packed
    step.unpack = lambda packed: unpack_step_result(np.asarray(packed), n, m)
    return step
