"""Batched primal-dual interior-point engine (LP / QP / convex NLP).

This replaces the reference's whole external-engine zoo — OsiLPEngine
(Clp dual simplex, OsiLPEngine.cpp:571-591), IpoptEngine
(IpoptEngine.cpp:668), BqpdEngine, qpOASESEngine — with ONE TPU-native
solver: a dense Mehrotra predictor-corrector interior-point method whose
KKT systems condense to an m x m Schur complement (normal equations),
factorized by Cholesky on the MXU.  Where the reference solves one
relaxation at a time behind an Engine ABC, this engine vmaps the entire
iteration across a *batch* of B&B nodes (same instance, different bound
boxes and cut rows) — thousands of relaxations per device dispatch.

Formulation (slack form; two-sided rows and bounds handled natively, which
the reference gets from Clp/Ipopt):

    min f(x) = c.x + x'Qx + f_nl(x)
    s.t. g(x) - s = 0,   lz <= z <= uz,   z = (x, s)

KKT residuals and the condensed Newton system are derived in the docstring
of `_make_step`.  Infinite bounds are masked (no multiplier on that side);
equality rows are fixed slacks (dl = du = 0, clamped).

Statuses mirror the reference's EngineStatus semantics (Types.h:152) since
the node-prune state machine consumes them (PCBProcessor.cpp:400-523).

A *certified* LP dual bound is computed from the final duals by clamping y
to signs compatible with finite row bounds and evaluating the box-LP dual
objective — any such (y, r) pair under-estimates the LP optimum, so B&B
pruning decisions never rely on unconverged primal values.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional

import numpy as np

from ..utils.types import EngineStatus
from .staging import StagedProblem

_BIG = 1e20


@dataclasses.dataclass(frozen=True)
class IPMOptions:
    max_iters: int = 90
    tol: float = 1e-8
    tau: float = 0.995          # fraction-to-boundary
    reg_primal: float = 1e-9
    reg_dual: float = 1e-9
    sigma_pow: int = 3          # Mehrotra sigma = (mu_aff/mu)^pow
    infeas_mu: float = 1e-10    # mu below this + primal infeasible => INFEAS
    # Factorize in f32 with Jacobi pre-scaling and refine the direction in
    # f64 against the true operator.  On TPU, f64 Cholesky is ~200x slower
    # than f32 (emulated sequential diagonal ops) while f64 matmuls are
    # near-native, so refinement is nearly free.  Soundness is unaffected
    # (certified bounds / residual-based statuses); only convergence speed
    # could suffer on ill-conditioned lanes.
    factor_f32: bool = True
    # refinement depth INSIDE each f32 SPD solve (iterations of
    # x += Minv(r - Mx)); every step costs one f32 (n,n) apply per solve
    # and the IPM issues ~7 solves/iteration, so this multiplies hard.
    # 0 disables inner refinement entirely — the BLOCK-level defect
    # correction (kkt_rounds/tail_kkt_rounds) re-solves against the true
    # operator anyway, making inner refinement largely redundant
    # (measured on the v5e color_lab batch at tail_kkt_rounds=4:
    # refine 0 beats refine 2 at the root 1.93 s/39 it vs 2.65 s/46 it
    # AND on warm children 0.53 s vs 0.60 s, with a better KKT floor
    # 2.4e-5 vs 8.2e-5).  Default keeps 2 (the long-validated setting);
    # the bench opts into 0 via ipm_refine_steps.
    refine_steps: int = 2
    kkt_rounds: int = 1         # KKT-level defect-correction rounds (f32)
    # Fuse the per-iteration f32 factorize+invert into ONE Pallas kernel
    # (ops/pallas_kkt.py: blocked mask-vectorized Cholesky + triangular
    # inverse + Linv'Linv).  Applies only on the TPU backend; CPU
    # (tests, dryrun meshes) always uses the XLA path.  Default OFF:
    # measured on the tunnel-attached v5e (scripts/microbench_calib.py
    # shapes, B=64 n=300) the kernel factorizes+inverts in 20 ms vs the
    # XLA single chol+cho_solve(eye) at 8.7 ms — this environment's VPU
    # is too slow for the kernel's 384 mask-vectorized column steps —
    # and its f32 factor is ~3x noisier (1.2e-6 vs 3.8e-7 residual),
    # inflating warm-start iteration counts (55 vs 39 root iters).
    # Kept as an evaluable component for real production v5e parts.
    use_pallas: bool = False
    # Retry a failed f32 Cholesky once with a Gershgorin shift (inertia
    # correction).  The retry costs a SECOND unconditional batched
    # cholesky in the traced program every iteration; with chol_retry
    # False, failed lanes get the identity factor + certificates (sound,
    # convergence-only fallback).  NL paths always keep the retry
    # (indefinite Lagrangian Hessians fail routinely; LP/PSD-QP lanes
    # only fail on extreme f32 roundoff).
    chol_retry: bool = True
    # keep the f32 factorization in the TAIL phase too (with deeper
    # defect correction) instead of switching to f64 Cholesky — on TPU
    # the f64 factorization is emulated and dominated the whole solve
    # (measured v5e: 58.4 s -> 21.8 s per 64-lane batch on color_lab).
    # Lanes the f32 tail cannot converge report ITERATION_LIMIT and keep
    # their certified bounds; infeasibility claims need a Farkas
    # certificate either way, so soundness is unaffected.
    tail_factor_f32: bool = True
    # defect-correction depth in the f32 tail.  Each round costs one f64
    # structured matvec per direction (~5.5 ms on the v5e at B=64,
    # n=300).  4 rounds looked strictly better on the synthetic profiler
    # boxes (warm children -24%) but on the REAL bench tree its accuracy
    # floor left many lanes unconverged and running to the iteration cap
    # (bench 18.8 -> 8.0 nodes/s) — keep 8.
    tail_kkt_rounds: int = 8
    # convergence target for the all-f32 tail: the refined f32
    # factorization floors around 2e-6 KKT error even with deep defect
    # correction, so demanding tol=1e-8 would turn every lane into an
    # ITERATION_LIMIT.  1e-5 is above the measured floor and matches
    # Ipopt's acceptable_tol; certified LP/QP dual bounds are computed
    # from the duals regardless, so pruning stays sound.
    tail_tol: float = 1e-5
    # run the PHASE-1 iteration arithmetic (residuals, KKT build, defect
    # correction, line-search trials) entirely in f32: phase 1 only
    # targets a 1e-4 KKT error and TPU f64 is emulated at matrix scale
    # (~20-50x), so the f64 passes were pure overhead.  Soundness is
    # unaffected — certificates and final statuses are (re)computed in
    # f64 after the loop, and a Farkas exit raised from f32 arithmetic
    # must be confirmed by the f64 certificate before a lane is declared
    # infeasible.  Default OFF: measured on the v5e (color_lab 64-lane
    # supersteps) the light phase cuts the root superstep 11.2s -> 7.9s
    # but its f32 noise inflates warm-started child iterations (11 -> 26)
    # and erases the dual-warm-start win (3.1s -> 3.8s per child
    # superstep); children dominate a B&B run, so f64 phase-1 arithmetic
    # with f32 factorization wins end-to-end.
    light_phase1: bool = False
    # compute the TAIL's block-level defect-correction residuals in f32
    # too (floors the correction near 1e-7 relative instead of ~1e-9;
    # fine for tail_tol=1e-5 but kept off until measured)
    tail_corr_f32: bool = False
    # assemble the condensed KKT matrix in the FACTOR dtype (f32) even in
    # non-light steps: the f64 product only fed the SPD solver's internal
    # f64 refinement (2 emulated (n,n) matvecs per solve, ~18 solves per
    # iteration at kkt_rounds=8), which the f64 BLOCK corrections below
    # supersede.  Accuracy then rests entirely on the block corrections,
    # whose residuals stay f64 against the structured operator (W, J
    # matvecs) — no f64 (n,n) matmul anywhere in the iteration.
    light_assembly: bool = True
    # KKT correction rounds for the AFFINE predictor solve (the corrector
    # keeps kkt_rounds/tail_kkt_rounds): the predictor only shapes the
    # centering weight sigma and the corrector's complementarity terms,
    # so it tolerates a shallower correction.  None = same as corrector.
    affine_kkt_rounds: Optional[int] = 1
    # NL "solved to acceptable level" threshold (Ipopt acceptable_tol):
    # an NL lane that plateaus at this scaled KKT error with a feasible
    # primal counts as converged — the reference accepts Ipopt's
    # STOP_AT_ACCEPTABLE_POINT the same way
    acceptable_tol: float = 1e-6
    # Gondzio multiple centrality corrections (LP/QP path): after the
    # Mehrotra corrector, re-solve with a complementarity-only rhs that
    # pushes outlier products back into [0.1, 10] x (sigma*mu) at an
    # enlarged trial step, and keep the corrected direction per lane only
    # where it lengthens the step.  Each correction reuses the iteration's
    # factorization (one cheap solve), trading solves for iterations —
    # the right trade on TPU where the f32 factorization dominates the
    # iteration cost.  Default 0: measured on the v5e (color_lab) the
    # corrections did NOT reduce iteration counts (root 39 -> 46, warm
    # children unchanged at 11) and the extra solves cost ~25% device
    # time — kept as an instance-tunable knob.
    gondzio_correctors: int = 0


class IPMResult(NamedTuple):
    x: "jnp.ndarray"          # (B, n) primal point
    obj: "jnp.ndarray"        # (B,) objective value (incl. const)
    dual_bound: "jnp.ndarray" # (B,) certified lower bound (LP) or obj-eps
    y: "jnp.ndarray"          # (B, m) row duals
    status: "jnp.ndarray"     # (B,) EngineStatus codes
    iters: "jnp.ndarray"      # (B,)
    kkt_err: "jnp.ndarray"    # (B,)


def _fin(jnp, b):
    return jnp.abs(b) < _BIG


def _max_step(jnp, v, dv, tau, mask):
    """Largest alpha in (0, 1] with v + alpha*dv >= (1-tau)*v on mask."""
    bad = (dv < 0) & mask
    ratio = jnp.where(bad, -tau * v / jnp.where(bad, dv, -1.0), 1.0)
    return jnp.minimum(1.0, jnp.min(ratio, initial=1.0))


def _make_spd_solver(jax, jnp, M, opts: "IPMOptions", use_f32=None,
                     out_dtype=None):
    """SPD solve M x = r with optional f32 factorization.

    Jacobi-equilibrates M (the barrier's ill-conditioning is mostly
    diagonal), Cholesky-factorizes in f32, and refines each solve
    against the operator M in M's OWN dtype (pass M in f32 to keep the
    whole refinement emulated-f64-free; block-level defect correction at
    the KKT level recovers accuracy against the true operator).  Falls
    back to a Gershgorin-shifted retry if the factorization produces
    non-finite values (inertia correction).  Solves return `out_dtype`
    (default M.dtype); pass f64 when corrections must ACCUMULATE below
    f32 resolution (the IPM tail).
    Returns (solve, bad_flag)."""
    k = M.shape[0]
    # Jacobi scaling clamped so indefinite inputs (negative diagonals from
    # nonconvex Lagrangian Hessians) do not explode the equilibration
    diag = jnp.diagonal(M)
    dmax = jnp.maximum(jnp.max(jnp.abs(diag), initial=0.0), 1e-30)
    d = jnp.sqrt(jnp.clip(diag, 1e-12 * dmax, None))
    dinv = 1.0 / d

    if use_f32 is None:
        use_f32 = opts.factor_f32

    if use_f32:
        # scale AFTER the f32 cast: full-matrix f64 elementwise passes are
        # emulated (~20x) on TPU and the factorization is f32 anyway —
        # only apply_eff below needs the true f64 operator
        dinv_f = dinv.astype(jnp.float32)
        Ms = M.astype(jnp.float32) * dinv_f[:, None] * dinv_f[None, :]
    else:
        Ms = M * dinv[:, None] * dinv[None, :]

    if use_f32 and opts.use_pallas and jax.default_backend() == "tpu":
        # ONE fused Pallas kernel: blocked Cholesky + triangular
        # inverse + Linv'Linv.  The XLA pair (two blocked chols +
        # cho_solve(eye)) expands into many small HLO ops, and this
        # environment is launch-overhead bound
        # (scripts/microbench_calib.py).  NOTE: the kernel has NO
        # in-kernel Gershgorin retry (pl.when with data-dependent
        # predicates SIGABRTs Mosaic — see ops/pallas_kkt.py); lanes
        # whose factorization breaks down return the identity with
        # flag=2, exactly like the XLA fallback below.
        from ..ops.pallas_kkt import _spd_inverse_vmappable
        Minv_s, _plflag = _spd_inverse_vmappable(4, False)(Ms)
        failed = _plflag >= 2.0
        # no shift was ever applied inside the kernel (failed lanes got
        # the identity), so shift_vec=0 is correct for the
        # monotone-guarded refinement below
        shift_vec = jnp.zeros_like(d)
        bad = failed
        bad2 = failed
    elif use_f32 and not opts.chol_retry:
        # single-chol fast path: no Gershgorin retry (the second
        # unconditional batched cholesky measured pathologically slow in
        # some XLA schedules — 739 ms vs 8.7 ms for chol+inverse alone,
        # scripts/microbench_calib.py).  Failed lanes (NaN factor) get
        # the identity; certificates + the NaN guard keep them sound.
        import jax.scipy.linalg as jsl
        L = jnp.linalg.cholesky(Ms)
        Minv_s = jsl.cho_solve((L, True), jnp.eye(k, dtype=L.dtype))
        bad = ~jnp.all(jnp.isfinite(Minv_s))
        Minv_s = jnp.where(bad, jnp.eye(k, dtype=Ms.dtype), Minv_s)
        bad2 = bad
        shift_vec = jnp.zeros_like(d)
    else:
        def chol(mat):
            return jnp.linalg.cholesky(mat)

        L1 = chol(Ms)
        bad = ~jnp.all(jnp.isfinite(L1))
        gersh = jnp.min(jnp.diagonal(Ms) -
                        (jnp.sum(jnp.abs(Ms), axis=1) -
                         jnp.abs(jnp.diagonal(Ms))), initial=0.0)
        shift = jnp.where(bad, jnp.maximum(1e-6, -gersh) + 1e-6, 0.0)
        L2 = chol(Ms + (shift + 1e-7) * jnp.eye(k, dtype=Ms.dtype))
        L = jnp.where(bad, L2, L1)
        bad2 = ~jnp.all(jnp.isfinite(L))
        L = jnp.where(bad2, jnp.eye(k, dtype=L.dtype), L)
        # the operator actually factorized (for refinement): the inertia
        # shift lives in scaled space, adding shift * d^2 diagonally
        shift_vec = jnp.where(bad, shift + 1e-7, 0.0) * d * d

        import jax.scipy.linalg as jsl

        # Explicit inverse of the scaled factorized operator:
        # triangular-solve CALLS are latency-bound on TPU (~8 ms each
        # regardless of rhs width), and the IPM issues dozens per
        # iteration — so pay 2 wide TRSMs here and make every
        # subsequent solve a pure MXU matmul.
        # NOTE: Linv.T @ Linv (one triangular solve + one matmul) was
        # measured 3x WORSE end-to-end than cho_solve's two triangular
        # passes on the v5e bench — keep cho_solve.
        Minv_s = jsl.cho_solve((L, True), jnp.eye(k, dtype=L.dtype))

    if out_dtype is None:
        out_dtype = M.dtype
    dinv_m = dinv.astype(M.dtype)

    def base_solve(r):
        # scaled solve in factor dtype; handles vector or matrix rhs.
        # All arithmetic stays in M's dtype — the caller chooses f32 to
        # avoid emulated-f64 matvecs (TPU).
        rr = r if r.ndim == 2 else r[:, None]
        u = (rr.astype(M.dtype) * dinv_m[:, None]).astype(Ms.dtype)
        v = Minv_s @ u
        out = v.astype(M.dtype) * dinv_m[:, None]
        return out if r.ndim == 2 else out[:, 0]

    def apply_eff(x):
        # operator matching the factorization (including inertia shift)
        if x.ndim == 2:
            return M @ x + shift_vec[:, None] * x
        return M @ x + shift_vec * x

    def solve_xla(r):
        # Refinement needed now that solves go through an explicit
        # inverse (error ~ kappa*eps instead of backward-stable), and
        # MONOTONE: on indefinite-but-factorizable matrices (nonconvex
        # Lagrangians whose Cholesky happens to succeed) naive refinement
        # diverges — keep a correction only if the residual norm drops.
        # All refinement arithmetic runs in M's dtype: the caller passes
        # M in f32 to keep this loop off the emulated-f64 path.
        # fori_loop (not unrolled): the loop body is large and appears at
        # every solve site — unrolling made device programs take >30 min
        # to compile through the remote-compile tunnel.
        rr = r.astype(M.dtype)
        x = base_solve(rr)
        steps = opts.refine_steps if use_f32 \
            else max(opts.refine_steps, 3)
        if steps == 0:
            # no inner refinement (the block-level KKT defect correction
            # supersedes it): skip the residual matvec entirely — one
            # batched (B,n,n) apply per solve saved
            return x.astype(out_dtype)
        res = rr - apply_eff(x)
        nrm = jnp.sum(res * res)

        def refine_body(_, carry):
            x, res, nrm = carry
            x2 = x + base_solve(res)
            res2 = rr - apply_eff(x2)
            nrm2 = jnp.sum(res2 * res2)
            better = nrm2 < nrm
            return (jnp.where(better, x2, x), jnp.where(better, res2, res),
                    jnp.minimum(nrm2, nrm))

        # f64 factorizations (NLP path) keep a deeper floor: explicit-
        # inverse solves err at ~kappa*eps even in f64, and one round is
        # not enough on ill-conditioned fixed-variable KKTs
        steps = opts.refine_steps if use_f32 \
            else max(opts.refine_steps, 3)
        x, _, _ = jax.lax.fori_loop(0, steps, refine_body, (x, res, nrm))
        return x.astype(out_dtype)

    return solve_xla, (bad & bad2)


def build_single_solver(sp: StagedProblem, opts: IPMOptions = IPMOptions(),
                        ) -> Callable:
    """Returns the traceable single-lane solver
    solve_one(A, clb, cub, vlb, vub, x0) -> IPMResult (unbatched, unjitted)
    for fusing into larger device programs (the B&B superstep)."""
    import jax
    import jax.numpy as jnp

    n, m = sp.n, sp.m
    has_nl = bool(len(sp.nl_rows)) or sp.obj_nl is not None
    has_q = sp.Qobj is not None
    is_lp = not has_nl and not has_q
    # condensation choice (static): x-space (n x n) for NLP/QP and for LPs
    # with many rows (cut pools); m-space for skinny LPs
    condense_x = (not is_lp) or (m >= n)
    # equality rows are static structure (cut rows are always
    # inequalities); in x-space they get an explicit KKT block — a
    # penalty pin would let the fixed slack absorb infeasibility and
    # report "optimal" on infeasible nodes
    eq_rows = np.where(np.isfinite(sp.clb) & np.isfinite(sp.cub) &
                       (np.abs(sp.cub - sp.clb) <= 1e-12))[0].astype(np.int32)
    m_eq = len(eq_rows)

    # f32 factorization is restricted to LP/QP paths: nonconvex NLP
    # Lagrangian Hessians change every iteration and the f32 phase can
    # poison the multipliers faster than refinement recovers
    if has_nl and opts.factor_f32:
        opts = dataclasses.replace(opts, factor_f32=False)

    c_const = jnp.asarray(sp.c)
    Q_const = jnp.asarray(sp.Qobj) if has_q else None
    # hessian of x'Qx (== 2Q for symmetric Q); used by the explicit
    # LP/QP gradient in the dtype-parametrized residuals
    Qsym_const = (Q_const + Q_const.T) if has_q else None
    obj_nl = sp.obj_nl
    con_nl = sp.con_nl
    nl_rows = jnp.asarray(sp.nl_rows) if len(sp.nl_rows) else None

    # static eigendecomposition of a PSD quadratic objective: enables a
    # CERTIFIED dual bound for QP lanes (see qp_cert_bound below), so
    # unconverged QP lanes prune soundly just like LP lanes
    q_psd = False
    if has_q and not has_nl:
        _w, _V = np.linalg.eigh(0.5 * (sp.Qobj + sp.Qobj.T))
        if _w.min() >= -1e-9:
            q_psd = True
            _w = np.clip(_w, 0.0, None)
            q_eigw = jnp.asarray(_w)
            q_eigV = jnp.asarray(_V)
            q_wpos = jnp.asarray(_w > 1e-10)
            q_eigw32 = q_eigw.astype(jnp.float32)
            q_eigV32 = q_eigV.astype(jnp.float32)

    # ---------------- problem callables --------------------------------
    def f_obj(x, c):
        v = c @ x
        if has_q:
            v = v + x @ (Q_const @ x)
        if obj_nl is not None:
            v = v + obj_nl(x)
        return v

    def g_con(A, x):
        v = A @ x
        if con_nl is not None:
            v = v.at[nl_rows].add(con_nl(x))
        return v

    grad_f = jax.grad(f_obj, argnums=0)

    if con_nl is not None:
        jac_nl = jax.jacfwd(con_nl)

        def jac(A, x):
            return A.at[nl_rows].add(jac_nl(x))
    else:
        def jac(A, x):
            return A

    if has_nl:
        def lag_nl(x, y):
            v = obj_nl(x) if obj_nl is not None else 0.0
            if con_nl is not None:
                v = v + y[nl_rows] @ con_nl(x)
            return v
        hess_lag_nl = jax.hessian(lag_nl, argnums=0)

    def hess_W(x, y):
        W = jnp.zeros((n, n))
        if has_q:
            W = W + 2.0 * Q_const
        if has_nl:
            W = W + hess_lag_nl(x, y)
        return W

    # ---------------- single-lane solve --------------------------------
    # c_in is traced so heuristics (feasibility pump distance objectives)
    # can swap linear objectives without recompiling.  y0 (row duals)
    # warm-starts the dual side: the reference leans on simplex/active-set
    # warm starts (OsiLPEngine.cpp:591); the IPM analogue is starting y at
    # the parent's multipliers and splitting the stationarity residual
    # into bound multipliers, which shortens the mu walk on child nodes.
    def solve_impl(A, clb, cub, vlb, vub, x0, c_in, y0=None):
        lz = jnp.concatenate([vlb, clb])
        uz = jnp.concatenate([vub, cub])
        # fixed coordinates (equality rows; branching-fixed variables) get
        # no barrier — they are pinned by a huge diagonal in the KKT
        # system, the clean limit of the condensed normal equations.
        fixed = _fin(jnp, lz) & _fin(jnp, uz) & ((uz - lz) <= 1e-12)
        fin_l = _fin(jnp, lz) & ~fixed
        fin_u = _fin(jnp, uz) & ~fixed
        nb = jnp.maximum(jnp.sum(fin_l) + jnp.sum(fin_u), 1)
        fixed_x = fixed[:n]
        # pin weight for fixed SLACKS (equality rows).  Fixed VARIABLES
        # are eliminated exactly instead: their Jacobian columns and
        # Hessian rows/cols are masked to zero and dx forced to 0 — a
        # penalty pin on the diagonal would compete with the equality
        # rows' own penalty terms inside J' Ds J and let fixed vars drift.
        _PIN = 1e10 if condense_x else 1e16

        def clampz(z):
            mid_frac = 0.01
            width = jnp.where(fin_l & fin_u, uz - lz, 2.0)
            lo = jnp.where(fin_l, lz + mid_frac * jnp.minimum(width, 100.0), -_BIG)
            hi = jnp.where(fin_u, uz - mid_frac * jnp.minimum(width, 100.0), _BIG)
            z = jnp.clip(z, lo, hi)
            return jnp.where(fixed, lz, z)

        x_init = clampz(jnp.concatenate([x0, jnp.zeros(m)]))[:n]
        s_init = clampz(jnp.concatenate([jnp.zeros(n), g_con(A, x_init)]))[n:]
        z0 = jnp.concatenate([x_init, s_init])
        if y0 is None:
            zl0 = jnp.where(fin_l, 1.0, 0.0)
            zu0 = jnp.where(fin_u, 1.0, 0.0)
            y0 = jnp.zeros(m)
        else:
            # dual warm start: keep the parent's row duals and derive the
            # bound multipliers from the reduced-cost split of the
            # stationarity conditions at (x_init, y0):
            #   zl - zu = [grad f + J'y ; -y]  (rd_x = rd_s = 0),
            # floored so complementarity starts at a moderate mu instead
            # of the cold-start mu ~ 1.
            y0 = jnp.where(jnp.isfinite(y0), y0, 0.0)
            J0 = jac(A, x_init)
            rz = jnp.concatenate([grad_f(x_init, c_in) + J0.T @ y0, -y0])
            zl0 = jnp.where(fin_l, jnp.clip(rz, 1e-2, 1e8), 0.0)
            zu0 = jnp.where(fin_u, jnp.clip(zl0 - rz, 1e-2, 1e8), 0.0)

        def distances(z):
            dl = jnp.where(fin_l, z - lz, 1.0)
            du = jnp.where(fin_u, uz - z, 1.0)
            return jnp.maximum(dl, 1e-14), jnp.maximum(du, 1e-14)

        # ---- per-solve constant operators + dtype environments ----------
        # For LP/QP the Jacobian is A and the Lagrangian Hessian is the
        # constant 2Q, so the fixed-var-masked copies are built ONCE per
        # solve instead of per iteration.  TPU f64 is emulated at matrix
        # scale (~20-50x slower, see CLAUDE.md), so every (n,n)/(n,m)
        # contraction inside the iteration runs through one of two
        # environments: env64 (true operator — soundness-critical work)
        # and env32 (f32 copies — the light phase-1 iteration, KKT-matrix
        # assembly, and certificate *selection* proxies).
        f32 = jnp.float32
        f64 = jnp.float64
        HI = jax.lax.Precision.HIGHEST

        def _split64(a):
            """hi/lo f32 split of an f64 operand (hi + lo == a exactly)."""
            hi = a.astype(f32)
            return hi, (a - hi.astype(f64)).astype(f32)

        if not has_nl:
            # Fixed-variable masking is FACTORED, never materialized:
            # (mask2 . W) @ v == mx . (W @ (mx . v)) and J_colmasked @ v
            # == A @ (mx . v) (or dx already zero on fixed coords), so
            # every per-lane masked-operator contraction becomes a
            # SHARED-matrix matmul.  A per-lane (B,n,n) f64 matvec is
            # emulated at ~5-8 ms on the v5e; the shared form is ~25x
            # cheaper and the split-f32 form below ~100x.
            mx64 = jnp.where(fixed_x, 0.0, 1.0)
            mx32 = mx64.astype(f32)
            _cv = lambda a: None if a is None else a.astype(f32)
            A_sp = _split64(A)
            qV_sp = _split64(q_eigV) if q_psd else None
            env64 = dict(dt=f64, A=A, clb=clb, cub=cub,
                         vlb=vlb, vub=vub, c=c_in,
                         Qsym=(Qsym_const if has_q else None),
                         qV=(q_eigV if q_psd else None),
                         qw=(q_eigw if q_psd else None))
            env32 = dict(dt=f32, A=_cv(A),
                         clb=_cv(clb), cub=_cv(cub), vlb=_cv(vlb),
                         vub=_cv(vub), c=_cv(c_in),
                         Qsym=_cv(Qsym_const) if has_q else None,
                         qV=(q_eigV32 if q_psd else None),
                         qw=(q_eigw32 if q_psd else None))

            def spmv(hi_lo, v64, trans=False):
                """f64-class matvec of a SHARED f64 operator via hi/lo
                f32 MXU matmuls + f64 vector combines.  The lo terms
                cancel the f32 REPRESENTATION error of operator and
                vector exactly; what remains is the f32 accumulation
                error of the main product, ~sqrt(n)*eps32 relative —
                ample for defect-correction residuals (targets ~1e-5)
                at ~100x less cost than the emulated f64 matmul it
                replaces (measured 5-8 ms per batched (B,n,n) f64
                matvec on the v5e)."""
                hi, lo = hi_lo
                if trans:
                    hi, lo = hi.T, lo.T
                vh = v64.astype(f32)
                vl = (v64 - vh.astype(f64)).astype(f32)
                main = jnp.matmul(hi, vh, precision=HI)
                corr = jnp.matmul(hi, vl, precision=HI) + \
                    jnp.matmul(lo, vh, precision=HI)
                return main.astype(f64) + corr.astype(f64)
        light_on = (not has_nl) and opts.factor_f32 and opts.light_phase1

        def residuals_e(z, y, zl, zu, e):
            """LP/QP KKT residuals in the dtype of environment e."""
            dt = e["dt"]
            x, s = z[:n].astype(dt), z[n:].astype(dt)
            yk = y.astype(dt)
            gf = e["c"] + (e["Qsym"] @ x if has_q else 0.0)
            rd_x = gf + e["A"].T @ yk - zl[:n].astype(dt) + zu[:n].astype(dt)
            rd_s = -yk - zl[n:].astype(dt) + zu[n:].astype(dt)
            rd_x = jnp.where(fixed[:n], 0.0, rd_x)
            rd_s = jnp.where(fixed[n:], 0.0, rd_s)
            rp = e["A"] @ x - s
            return rd_x, rd_s, rp

        def residuals(A, z, y, zl, zu):
            x, s = z[:n], z[n:]
            J = jac(A, x)
            gf = grad_f(x, c_in)
            rd_x = gf + J.T @ y - zl[:n] + zu[:n]
            rd_s = -y - zl[n:] + zu[n:]
            # fixed coordinates carry an implicit free multiplier that
            # absorbs their dual residual exactly
            rd_x = jnp.where(fixed[:n], 0.0, rd_x)
            rd_s = jnp.where(fixed[n:], 0.0, rd_s)
            rp = g_con(A, x) - s
            return rd_x, rd_s, rp, J, gf

        def kkt_error(z, y, zl, zu, rd_x, rd_s, rp):
            dl, du = distances(z)
            comp = jnp.sum(jnp.where(fin_l, dl * zl, 0.0)) + \
                jnp.sum(jnp.where(fin_u, du * zu, 0.0))
            mu = comp / nb
            sd = jnp.maximum(1.0, (jnp.sum(jnp.abs(y)) +
                                   jnp.sum(zl) + jnp.sum(zu)) / (n + m))
            # primal infeasibility is UNSCALED (Ipopt convention): scaled
            # equality violations let quadratic bodies trade feasibility
            # for objective at sqrt(tol) rates
            err = jnp.maximum(
                jnp.max(jnp.abs(rp), initial=0.0),
                jnp.maximum(jnp.max(jnp.abs(jnp.concatenate([rd_x, rd_s]))) / sd,
                            mu / sd))
            return err, mu

        def _cert_clamp_t(y, e):
            """Row-dual clamp shared by every certificate: coordinates
            whose needed row bound is infinite force that multiplier to
            zero."""
            t = -y.astype(e["dt"])
            tc = jnp.where((t > 0) & ~_fin(jnp, e["clb"]), 0.0, t)
            tc = jnp.where((tc < 0) & ~_fin(jnp, e["cub"]), 0.0, tc)
            return tc

        def _cert_lp_terms(tc, r, const, e):
            """Box-LP dual objective from clamped row duals tc and
            reduced costs r (shared by the f64 certificate and the
            split-f32 selection proxy)."""
            evlb, evub = e["vlb"], e["vub"]
            rc = jnp.where((r > 0) & ~_fin(jnp, evlb), 0.0, r)
            rc = jnp.where((rc < 0) & ~_fin(jnp, evub), 0.0, rc)
            box = jnp.where(_fin(jnp, evub) & _fin(jnp, evlb),
                            jnp.maximum(jnp.abs(evub), jnp.abs(evlb)), 1e6)
            slack_pen = jnp.sum(jnp.abs(r - rc) * box)
            row_term = jnp.sum(jnp.where(tc > 0, tc * e["clb"],
                                         jnp.where(tc < 0, tc * e["cub"],
                                                   0.0)))
            col_term = jnp.sum(jnp.where(rc > 0, rc * evlb,
                                         jnp.where(rc < 0, rc * evub, 0.0)))
            b = row_term + col_term - slack_pen + const
            return jnp.where(jnp.isnan(b), -_BIG, b)

        def _cert_qp_terms(tc, quad_min, r0, e):
            """QP certificate combine from clamped duals, the
            eigen-space quadratic minimum, and the null-space reduced
            costs r0 (shared by qp_cert_bound and its split proxy)."""
            evlb, evub = e["vlb"], e["vub"]
            rc = jnp.where((r0 > 0) & ~_fin(jnp, evlb), 0.0, r0)
            rc = jnp.where((rc < 0) & ~_fin(jnp, evub), 0.0, rc)
            box = jnp.where(_fin(jnp, evub) & _fin(jnp, evlb),
                            jnp.maximum(jnp.abs(evub), jnp.abs(evlb)), 1e6)
            pen = jnp.sum(jnp.abs(r0 - rc) * box)
            col0 = jnp.sum(jnp.where(rc > 0, rc * evlb,
                                     jnp.where(rc < 0, rc * evub, 0.0)))
            row_term = jnp.sum(jnp.where(tc > 0, tc * e["clb"],
                                         jnp.where(tc < 0, tc * e["cub"],
                                                   0.0)))
            b = row_term + quad_min + col0 - pen + sp.obj_const
            return jnp.where(jnp.isnan(b), -_BIG, b)

        def cert_bound_generic(y, cvec, const, e, with_scale=False):
            """min_{z in box} [cvec.x + y.(Ax - s)] + const — the engine
            of both the certified LP dual bound and the Farkas
            infeasibility certificate (cvec = 0).  with_scale also
            returns the absolute-magnitude sum of every term, an upper
            bound on the cancellation that floating-point evaluation of
            the bound can suffer.  `e` selects the evaluation dtype:
            env64 for SOUND bounds (pruning / final statuses), env32 for
            the cheap per-iteration *selection* proxy (which y to keep —
            a wrong pick costs bound tightness, never soundness)."""
            eA, eclb, ecub = e["A"], e["clb"], e["cub"]
            evlb, evub = e["vlb"], e["vub"]
            tc = _cert_clamp_t(y, e)
            r = cvec - eA.T @ tc          # = cvec + A'(-tc)
            b = _cert_lp_terms(tc, r, const, e)
            if not with_scale:
                return b
            # |A|'|tc| bounds the matvec's own magnitude (its fp error is
            # a small multiple of eps times this)
            rc = jnp.where((r > 0) & ~_fin(jnp, evlb), 0.0, r)
            rc = jnp.where((rc < 0) & ~_fin(jnp, evub), 0.0, rc)
            box = jnp.where(_fin(jnp, evub) & _fin(jnp, evlb),
                            jnp.maximum(jnp.abs(evub), jnp.abs(evlb)), 1e6)
            slack_pen = jnp.sum(jnp.abs(r - rc) * box)
            mat_mag = jnp.sum(jnp.abs(eA.T) @ jnp.abs(tc))
            scale = (jnp.sum(jnp.abs(tc) *
                             jnp.where(_fin(jnp, eclb), jnp.abs(eclb), 0.0)) +
                     jnp.sum(jnp.abs(tc) *
                             jnp.where(_fin(jnp, ecub), jnp.abs(ecub), 0.0)) +
                     jnp.sum(jnp.abs(rc) * box) + slack_pen + mat_mag +
                     jnp.abs(const))
            return b, scale

        def farkas_infeasible(y, e, margin):
            """True only with a CERTIFICATE: some y proves
            min_{box} y.(Ax - s) > 0, i.e. no point in the box satisfies
            the linear rows (valid for LP and QP — constraints are
            linear).  Lets infeasible lanes exit the vmapped loop early
            instead of burning the whole iteration budget (the batch
            runs at the pace of its slowest lane).  The margin is
            RELATIVE to the total term magnitude: TPU f64 is emulated,
            so an absolute margin scaled only by |y| fired falsely on
            borderline-feasible lanes (measured on the v5e).  f32
            evaluations (light phase) use a wider margin AND every
            in-loop exit is re-confirmed against env64 after the loop
            before a lane is declared infeasible."""
            g0, scale = cert_bound_generic(
                y, jnp.zeros(n, dtype=e["dt"]), 0.0, e, with_scale=True)
            return g0 > margin * (1.0 + scale)

        if not has_nl:
            def farkas_sp(y):
                """In-loop Farkas test via split-f32 matvecs (f64-class;
                replaces the per-iteration emulated-f64 A matmuls).
                Every exit is still re-confirmed against env64 after the
                loop before a lane is declared infeasible."""
                e = env64
                tc = _cert_clamp_t(y, e)
                r = -spmv(A_sp, tc, trans=True)
                evlb, evub = e["vlb"], e["vub"]
                rc = jnp.where((r > 0) & ~_fin(jnp, evlb), 0.0, r)
                rc = jnp.where((rc < 0) & ~_fin(jnp, evub), 0.0, rc)
                box = jnp.where(_fin(jnp, evub) & _fin(jnp, evlb),
                                jnp.maximum(jnp.abs(evub),
                                            jnp.abs(evlb)), 1e6)
                slack_pen = jnp.sum(jnp.abs(r - rc) * box)
                row_term = jnp.sum(jnp.where(tc > 0, tc * e["clb"],
                                             jnp.where(tc < 0,
                                                       tc * e["cub"], 0.0)))
                col_term = jnp.sum(jnp.where(rc > 0, rc * evlb,
                                             jnp.where(rc < 0,
                                                       rc * evub, 0.0)))
                g0 = row_term + col_term - slack_pen
                g0 = jnp.where(jnp.isnan(g0), -_BIG, g0)
                # magnitude estimate for the relative margin: f32 ample
                mat_mag = jnp.sum(jnp.matmul(
                    jnp.abs(env32["A"]).T, jnp.abs(tc).astype(f32),
                    precision=HI)).astype(f64)
                scale = (jnp.sum(jnp.abs(tc) *
                                 jnp.where(_fin(jnp, e["clb"]),
                                           jnp.abs(e["clb"]), 0.0)) +
                         jnp.sum(jnp.abs(tc) *
                                 jnp.where(_fin(jnp, e["cub"]),
                                           jnp.abs(e["cub"]), 0.0)) +
                         jnp.sum(jnp.abs(rc) * box) + slack_pen + mat_mag)
                return g0 > 1e-5 * (1.0 + scale)

        def qp_cert_bound(y, e):
            """Certified lower bound for PSD-QP lanes:
               min_x [c.x + x'Qx + y.(Ax - s)]
            >= row_term(tc) + min_{x in R^n} [r.x + x'Qx] + const
             = row_term(tc) - 1/4 sum_{w_i>0} (V'r)_i^2 / w_i + const,
            where r = c + A'(-tc) and Q = V diag(w) V'.  Null-space
            components of r make the unconstrained min -inf, so they are
            bounded through the box exactly like the LP certificate
            (clamp + penalty)."""
            tc = _cert_clamp_t(y, e)
            r = e["c"] - e["A"].T @ tc
            alpha = e["qV"].T @ r
            quad_min = -0.25 * jnp.sum(
                jnp.where(q_wpos, alpha * alpha /
                          jnp.maximum(e["qw"], 1e-30), 0.0))
            # null-space part r0 = V alpha0 handled box-style
            r0 = e["qV"] @ jnp.where(q_wpos, 0.0, alpha)
            return _cert_qp_terms(tc, quad_min, r0, e)

        def dual_cert_bound(y, e):
            """Certified LP lower bound from any y.

            With the slack convention g(x) = s, l <= (x, s) <= u and row
            dual y (stationarity: c + A'y = zl - zu, -y = zl_s - zu_s), a
            valid bound for ANY y is

              g(y) = min_{z in box} [c'x + y'(Ax - s)]
                   = sum_j min(r_j x_j) + sum_i min(t_i s_i),
              r = c + A'y,  t = -y,

            where each min picks the finite box end matching the sign.
            Coordinates whose needed bound is infinite force that
            multiplier to 0 (t clamped first since it feeds r).  Residual
            reduced costs on unbounded coordinates are penalized by the
            finite box width (safe) or a 1e6 domain estimate for free
            variables (conservative heuristic; the reference prunes on
            fully unverified engine objectives, cf. PCBProcessor)."""
            return cert_bound_generic(y, e["c"], sp.obj_const, e)

        # Per-iteration certified-bound ratchet: the bound max'es over
        # the whole trajectory (a single-candidate selection measured
        # 4e-4 looser root bounds), but the f64 evaluation cost two
        # emulated (n,n) matvecs per iteration on the QP path.  The loop
        # therefore SELECTS the best dual candidate with a split-f32
        # proxy (f64-class accuracy from f32 MXU matmuls, see spmv) and
        # carries the winning y; the SOUND bound is re-evaluated from
        # that carried y in true f64 once after the loop — the proxy
        # value itself is never used as a prune bound.
        if is_lp:
            cert_f64 = lambda y: dual_cert_bound(y, env64)

            def cert_proxy(y):
                tc = _cert_clamp_t(y, env64)
                r = c_in - spmv(A_sp, tc, trans=True)
                return _cert_lp_terms(tc, r, sp.obj_const, env64)
        elif q_psd:
            cert_f64 = lambda y: qp_cert_bound(y, env64)

            def cert_proxy(y):
                tc = _cert_clamp_t(y, env64)
                r = c_in - spmv(A_sp, tc, trans=True)
                alpha = spmv(qV_sp, r, trans=True)
                quad_min = -0.25 * jnp.sum(
                    jnp.where(q_wpos, alpha * alpha /
                              jnp.maximum(q_eigw, 1e-30), 0.0))
                r0 = spmv(qV_sp, jnp.where(q_wpos, 0.0, alpha))
                return _cert_qp_terms(tc, quad_min, r0, env64)
        else:
            cert_f64 = None
            cert_proxy = None

        def make_step(use_f32, sopts=opts, light=False, ratchet=True):
          """One IPM iteration.  `use_f32` picks the FACTOR dtype;
          `light` runs the whole iteration arithmetic (residuals, KKT
          assembly, corrections, trials) in f32 against env32 — phase 1
          only targets a 1e-4 KKT error and every sound decision is
          (re)made in f64 after the loop.  `ratchet` enables the
          per-iteration f64 certified-bound update (the tail + polish
          steps); phase 1 skips it — its bounds tighten monotonically as
          mu drops, so early iterates never carry the max, and the QP
          certificate costs two f64 (n,n) matvecs per iteration."""
          e = env32 if light else (env64 if not has_nl else None)
          dt = f32 if light else f64
          fdt = f32 if use_f32 else f64

          def step(carry):
            (z, y, zl, zu, k, err, mu_prev, best_db, best_y, rvec, nu,
             stall, bz, by, bzl, bzu, berr, bmu) = carry
            x, s = z[:n], z[n:]
            dl, du = distances(z)
            if has_nl:
                # NL residuals need the fresh Jacobian/gradient anyway,
                # so nothing is saved by carrying them
                rd_x, rd_s, rp, J, gf = residuals(A, z, y, zl, zu)
            else:
                # LP/QP residuals at the CURRENT point are the previous
                # iteration's trial residuals — carried, not recomputed
                # (saves one f64 (n,n) Qsym matvec per iteration)
                rd_x, rd_s, rp = rvec[:n], rvec[n:n + m], rvec[n + m:]
                J = e["A"]

            comp = jnp.sum(jnp.where(fin_l, dl * zl, 0.0)) + \
                jnp.sum(jnp.where(fin_u, du * zu, 0.0))
            mu = comp / nb

            Dz = jnp.where(fin_l, zl / dl, 0.0) + jnp.where(fin_u, zu / du, 0.0)
            Dz = jnp.where(fixed, _PIN, Dz)
            Dx_diag = jnp.where(fixed_x, 1.0, Dz[:n] + sopts.reg_primal)
            Ds = Dz[n:] + sopts.reg_dual
            # iteration-dtype copies of the barrier weights (vector ops
            # are cheap in f64; these feed MATRIX contractions)
            Ds_d = Ds.astype(dt)
            Dx_d = Dx_diag.astype(dt)

            if condense_x:
                # x-space normal equations over INEQUALITY rows:
                #   Mx = W + Dx + J_in' Ds_in J_in     (n x n)
                # plus an explicit KKT block for equality rows:
                #   [Mx  J_eq'] [dx]     [rx]
                #   [J_eq   0 ] [dy_eq] = [rhs3_eq]
                # Fixed vars are exactly eliminated: column-masked J,
                # masked W, unit diagonal, zero rhs -> dx = 0 on them.
                ineq_w = Ds_d.at[eq_rows].set(0.0) if m_eq else Ds_d
                if has_nl:
                    Jm = jnp.where(fixed_x[None, :], 0.0, J)
                    W = hess_W(x, y)
                    wmask = (~fixed_x)[:, None] & (~fixed_x)[None, :]
                    W = jnp.where(wmask, W, 0.0)
                    if light or (use_f32 and sopts.light_assembly):
                        Jm_f = Jm.astype(fdt)
                        W_f = W.astype(fdt)
                        w_f = ineq_w.astype(fdt)
                        Mx = jnp.diag(Dx_d.astype(fdt)) + \
                            (Jm_f.T * w_f[None, :]) @ Jm_f + W_f
                    else:
                        Mx = jnp.diag(Dx_d) + \
                            (Jm.T * ineq_w[None, :]) @ Jm + W
                    solve_mx, _ = _make_spd_solver(jax, jnp, Mx, sopts,
                                                   use_f32, out_dtype=dt)
                    if m_eq:
                        Je = Jm[eq_rows]
                        MeJ = solve_mx(Je.T)
                        S = Je @ MeJ + 1e-10 * jnp.eye(m_eq, dtype=dt)
                        solve_s, _ = _make_spd_solver(jax, jnp, S, sopts,
                                                      use_f32, out_dtype=dt)

                    def raw_xyz(rhs1, rhs2, rhs3):
                        rx = rhs1 + Jm.T @ (ineq_w * rhs3.astype(dt) +
                                            rhs2.astype(dt))
                        rx = jnp.where(fixed_x, 0.0, rx)
                        if m_eq:
                            t = solve_mx(rx)
                            dy_eq = solve_s(Je @ t -
                                            rhs3.astype(dt)[eq_rows])
                            dx = t - MeJ @ dy_eq
                        else:
                            dx = solve_mx(rx)
                        dx = jnp.where(fixed_x, 0.0, dx)
                        ds = J @ dx - rhs3
                        dy = Ds_d * ds - rhs2
                        if m_eq:
                            # equality slacks do not move; their
                            # multipliers come from the Schur block
                            ds = ds.at[eq_rows].set(0.0)
                            dy = dy.at[eq_rows].set(dy_eq)
                        return dx, ds, dy

                    def corr_resid(dxc, dsc, dyc, cdt):
                        # NL correction residuals need the fresh per-lane
                        # J and W anyway — true-f64 structured operator
                        cDx = Dx_diag.astype(cdt)
                        cDs = Ds.astype(cdt)
                        wdx = W @ dxc + cDx * dxc
                        return (wdx + J.T @ dyc, cDs * dsc - dyc,
                                J @ dxc - dsc)
                else:
                    # LP/QP: SHARED operators with factored fixed-masks —
                    # no per-lane (B,n,n)/(B,m,n) operator is ever built
                    # (a batched f64 matvec is ~7x the cost of the shared
                    # form on the v5e).  Assembly runs in the factor
                    # dtype; the SOLVE CHAIN stays in the iteration dtype
                    # dt: the barrier weights span ~1e12, so w*rhs
                    # products and the multiplier recovery lose ~8 digits
                    # in f32 (measured: glob-hull lb loosened 1e-3) —
                    # and f64 VECTOR ops plus shared f64 matvecs are
                    # launch-overhead-bound on the v5e anyway (0.86 ms
                    # shared-f64 vs 0.88 ms split-f32).
                    adt = fdt if (light or sopts.light_assembly) else dt
                    easm = env32 if adt == f32 else env64
                    mxa = mx32 if adt == f32 else mx64
                    ed = env32 if dt == f32 else env64
                    Adt = ed["A"]
                    mxd = mx32 if dt == f32 else mx64
                    w_a = ineq_w.astype(adt)
                    gram = jnp.matmul(easm["A"].T * w_a[None, :],
                                      easm["A"], precision=HI)
                    core = gram if is_lp else gram + easm["Qsym"]
                    Mx = core * (mxa[:, None] * mxa[None, :]) + \
                        jnp.diag(Dx_d.astype(adt))
                    solve_mx, _ = _make_spd_solver(jax, jnp, Mx, sopts,
                                                   use_f32, out_dtype=dt)
                    if m_eq:
                        Ae = Adt[eq_rows]
                        MeJ = solve_mx(mxd[:, None] * Ae.T)
                        S = Ae @ (mxd[:, None] * MeJ) + \
                            1e-10 * jnp.eye(m_eq, dtype=dt)
                        solve_s, _ = _make_spd_solver(jax, jnp, S, sopts,
                                                      use_f32,
                                                      out_dtype=dt)

                    def raw_xyz(rhs1, rhs2, rhs3):
                        r2 = rhs2.astype(dt)
                        r3 = rhs3.astype(dt)
                        rx = rhs1 + mxd * (Adt.T @ (ineq_w * r3 + r2))
                        rx = jnp.where(fixed_x, 0.0, rx)
                        if m_eq:
                            t = solve_mx(rx)
                            dy_eq = solve_s(Ae @ (mxd * t) - r3[eq_rows])
                            dx = t - MeJ @ dy_eq
                        else:
                            dx = solve_mx(rx)
                        dx = jnp.where(fixed_x, 0.0, dx)
                        ds = Adt @ dx - r3
                        dy = Ds_d * ds - r2
                        if m_eq:
                            ds = ds.at[eq_rows].set(0.0)
                            dy = dy.at[eq_rows].set(dy_eq)
                        return dx, ds, dy

                    def corr_resid(dxc, dsc, dyc, cdt):
                        # residuals against the SHARED structured
                        # operator (mask factored: (mask2.W)@v ==
                        # mx.(W@(mx.v))) — never a per-lane (B,n,n)
                        # matvec (emulated f64 at ~7x the shared cost)
                        cDx = Dx_diag.astype(cdt)
                        cDs = Ds.astype(cdt)
                        if cdt == f32:
                            wdx = cDx * dxc
                            if not is_lp:
                                wdx = wdx + mx32 * jnp.matmul(
                                    env32["Qsym"], mx32 * dxc,
                                    precision=HI)
                            jt = jnp.matmul(env32["A"].T, dyc,
                                            precision=HI)
                            jdx = jnp.matmul(env32["A"], dxc,
                                             precision=HI)
                        else:
                            wdx = cDx * dxc
                            if not is_lp:
                                wdx = wdx + mx64 * (env64["Qsym"] @
                                                    (mx64 * dxc))
                            jt = mx64 * (env64["A"].T @ dyc)
                            jdx = env64["A"] @ dxc
                        return wdx + jt, cDs * dsc - dyc, jdx - dsc

                def solve_xyz(rhs1, rhs2, rhs3, rounds=None):
                    """raw solve + KKT-level defect correction: the naive
                    multiplier recovery dy = Ds*ds - rhs2 multiplies the
                    factor-dtype solve error by Ds (up to ~1e12 near
                    convergence), so residuals of the BLOCK equations are
                    recomputed against the structured operator and the
                    correction re-solved jointly.  Residual dtype: f32 in
                    the light phase (1e-4 target), f64-CLASS split-f32 in
                    the tail unless tail_corr_f32 (corrections themselves
                    ACCUMULATE in the iteration dtype).  Depth is a FIXED
                    fori_loop: a residual-gated while_loop (stop at f64
                    roundoff relative to the rhs) was measured 10% WORSE
                    on the bench (34.6 vs 38.8 nodes/s) — under vmap the
                    loop runs to the max lane's depth anyway, so per-lane
                    early exit saves nothing and the gate arithmetic
                    adds cost."""
                    if rounds is None:
                        rounds = sopts.kkt_rounds
                    dx, ds, dy = raw_xyz(rhs1, rhs2, rhs3)
                    if use_f32:
                        cdt = f32 if (light or sopts.tail_corr_f32) \
                            and not has_nl else f64

                        def corr_body(_, carry):
                            dx, ds, dy = carry
                            dxc = dx.astype(cdt)
                            dsc = ds.astype(cdt)
                            dyc = dy.astype(cdt)
                            r1, r2, r3 = corr_resid(dxc, dsc, dyc, cdt)
                            e1 = rhs1.astype(cdt) - r1
                            e1 = jnp.where(fixed_x, 0.0, e1)
                            e2 = rhs2.astype(cdt) - r2
                            e3 = rhs3.astype(cdt) - r3
                            if m_eq:
                                e2 = e2.at[eq_rows].set(0.0)
                            cx, cs, cy = raw_xyz(e1, e2, e3)
                            return dx + cx, ds + cs, dy + cy

                        dx, ds, dy = jax.lax.fori_loop(
                            0, rounds, corr_body, (dx, ds, dy))
                    return dx, ds, dy
            else:
                # m-space (classic normal equations) — better for LP with
                # few rows (condense_x covers every non-LP case):
                # M = J H^-1 J' + Ds^-1 (m x m).  Fixed vars are
                # eliminated via a zero inverse-diagonal (dx stays 0).
                Hinv_diag = jnp.where(fixed_x, 0.0, 1.0 / Dx_diag).astype(dt)
                # assembly in the factor dtype (SHARED A only — the
                # fixed-var mask is absorbed into the zeroed Hinv
                # diagonal); the SOLVE CHAIN stays in the iteration
                # dtype dt (barrier-weight dynamic range, see the
                # condense_x comment), with shared-matrix matvecs.
                adt = fdt if (light or sopts.light_assembly) else dt
                easm = env32 if adt == f32 else env64
                Adt = (env32 if dt == f32 else env64)["A"]
                Ha = Hinv_diag.astype(adt)
                Mf = jnp.matmul(easm["A"] * Ha[None, :], easm["A"].T,
                                precision=HI) + \
                    jnp.diag((1.0 / Ds_d).astype(adt))
                solve_m, _ = _make_spd_solver(jax, jnp, Mf, sopts, use_f32,
                                              out_dtype=dt)

                def raw_m(rhs1, rhs2, rhs3):
                    r1 = rhs1.astype(dt)
                    r2 = rhs2.astype(dt)
                    rhs_y = Adt @ (Hinv_diag * r1) - rhs3.astype(dt) \
                        - r2 / Ds_d
                    dy = solve_m(rhs_y)
                    dx = Hinv_diag * (r1 - Adt.T @ dy)
                    ds = (dy + r2) / Ds_d
                    return dx, ds, dy

                def solve_xyz(rhs1, rhs2, rhs3, rounds=None):
                    """raw normal-equations solve + block-level defect
                    correction (same scheme as the condense_x path): the
                    block residuals
                        e1 = rhs1 - (Dx*dx + J'dy)
                        e2 = rhs2 - (Ds*ds - dy)
                        e3 = rhs3 - (J dx - ds)
                    are recomputed against the structured operator
                    (split-f32, f64-class) and the correction re-solved —
                    recovers f64 direction accuracy from an all-f32
                    factorization without an f64 (m,m) build, refinement,
                    or emulated-f64 matmul anywhere."""
                    if rounds is None:
                        rounds = sopts.kkt_rounds
                    dx, ds, dy = raw_m(rhs1, rhs2, rhs3)
                    if use_f32:
                        plain32 = light or sopts.tail_corr_f32
                        cdt = f32 if plain32 else f64
                        cDx = Dx_diag.astype(cdt)
                        cDs = Ds.astype(cdt)

                        def corr_body(_, carry):
                            dx, ds, dy = carry
                            dxc = dx.astype(cdt)
                            dsc = ds.astype(cdt)
                            dyc = dy.astype(cdt)
                            if plain32:
                                jt = jnp.matmul(env32["A"].T, dyc,
                                                precision=HI)
                                jdx = jnp.matmul(env32["A"], dxc,
                                                 precision=HI)
                            else:
                                jt = env64["A"].T @ dyc
                                jdx = env64["A"] @ dxc
                            e1 = rhs1.astype(cdt) - (cDx * dxc + jt)
                            e1 = jnp.where(fixed_x, 0.0, e1)
                            e2 = rhs2.astype(cdt) - (cDs * dsc - dyc)
                            e3 = rhs3.astype(cdt) - (jdx - dsc)
                            cx, cs, cy = raw_m(e1, e2, e3)
                            return dx + cx, ds + cs, dy + cy

                        dx, ds, dy = jax.lax.fori_loop(
                            0, rounds, corr_body, (dx, ds, dy))
                    return dx, ds, dy

            def solve_dirs(sig_mu, dcl, dcu, rounds=None, rc=None,
                           resid=True):
                """dcl/dcu: extra complementarity correction terms.
                rc=(rc_l, rc_u) supplies the complementarity rhs directly
                (Gondzio corrections); resid=False drops the KKT residual
                terms (a pure direction CORRECTION solve)."""
                if rc is None:
                    rc_l = jnp.where(fin_l, sig_mu - dl * zl - dcl, 0.0)
                    rc_u = jnp.where(fin_u, sig_mu - du * zu - dcu, 0.0)
                else:
                    rc_l, rc_u = rc
                t_l = jnp.where(fin_l, rc_l / dl, 0.0)
                t_u = jnp.where(fin_u, rc_u / du, 0.0)
                rhs1 = t_l[:n] - t_u[:n]
                rhs2 = t_l[n:] - t_u[n:]
                if resid:
                    rhs1 = rhs1 - rd_x
                    rhs2 = rhs2 - rd_s
                    rhs3 = -rp
                else:
                    rhs3 = jnp.zeros_like(rp)
                dx, ds, dy = solve_xyz(rhs1, rhs2, rhs3, rounds)
                dz = jnp.concatenate([dx, ds])
                dzl = jnp.where(fin_l, (rc_l - zl * dz) / dl, 0.0)
                dzu = jnp.where(fin_u, (rc_u + zu * dz) / du, 0.0)
                return dz, dy, dzl, dzu

            # predictor (affine)
            import os as _os
            _abl = _os.environ.get("MT_ABLATE", "")
            if "nodirs" in _abl:
                zed = jnp.zeros_like(z)
                dz_a, dy_a = zed, jnp.zeros_like(y)
                dzl_a, dzu_a = zed, zed
            else:
                aff_rounds = sopts.kkt_rounds \
                    if sopts.affine_kkt_rounds is None \
                    else min(sopts.affine_kkt_rounds, sopts.kkt_rounds)
                dz_a, dy_a, dzl_a, dzu_a = solve_dirs(0.0, 0.0, 0.0,
                                                      rounds=aff_rounds)
            ap = jnp.minimum(_max_step(jnp, dl, dz_a, 1.0, fin_l),
                             _max_step(jnp, du, -dz_a, 1.0, fin_u))
            ad = jnp.minimum(_max_step(jnp, zl, dzl_a, 1.0, fin_l),
                             _max_step(jnp, zu, dzu_a, 1.0, fin_u))
            dl_a = dl + ap * dz_a
            du_a = du - ap * dz_a
            mu_aff = (jnp.sum(jnp.where(fin_l, dl_a * (zl + ad * dzl_a), 0.0)) +
                      jnp.sum(jnp.where(fin_u, du_a * (zu + ad * dzu_a), 0.0))) / nb
            sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** sopts.sigma_pow,
                             0.0, 1.0)

            # corrector
            if "nodirs" in _abl:
                dz_c, dy_c, dzl_c, dzu_c = dz_a, dy_a, dzl_a, dzu_a
            else:
                dz_c, dy_c, dzl_c, dzu_c = solve_dirs(
                    sigma * mu, dz_a * dzl_a, -dz_a * dzu_a)

            if (not has_nl) and sopts.gondzio_correctors > 0 \
                    and "nodirs" not in _abl:
                # Gondzio multiple centrality corrections: at an ENLARGED
                # trial step, clip outlier complementarity products back
                # into [0.1, 10] x target-mu, re-solve with that
                # complementarity-only rhs (same factorization, one cheap
                # solve), and keep the corrected direction per lane only
                # where it lengthens the combined step.
                mu_g = jnp.maximum(sigma * mu, 1e-300)
                for _ in range(sopts.gondzio_correctors):
                    ap_c = jnp.minimum(
                        _max_step(jnp, dl, dz_c, sopts.tau, fin_l),
                        _max_step(jnp, du, -dz_c, sopts.tau, fin_u))
                    ad_c = jnp.minimum(
                        _max_step(jnp, zl, dzl_c, sopts.tau, fin_l),
                        _max_step(jnp, zu, dzu_c, sopts.tau, fin_u))
                    ape = jnp.minimum(1.0, 1.5 * ap_c)
                    ade = jnp.minimum(1.0, 1.5 * ad_c)
                    dle = jnp.maximum(dl + ape * dz_c, 0.0)
                    due = jnp.maximum(du - ape * dz_c, 0.0)
                    zle = jnp.maximum(zl + ade * dzl_c, 0.0)
                    zue = jnp.maximum(zu + ade * dzu_c, 0.0)
                    vl = dle * zle
                    vu = due * zue
                    rc_l = jnp.where(fin_l,
                                     jnp.clip(vl, 0.1 * mu_g, 10.0 * mu_g)
                                     - vl, 0.0)
                    rc_u = jnp.where(fin_u,
                                     jnp.clip(vu, 0.1 * mu_g, 10.0 * mu_g)
                                     - vu, 0.0)
                    gdz, gdy, gdzl, gdzu = solve_dirs(
                        0.0, 0.0, 0.0, rounds=1, rc=(rc_l, rc_u),
                        resid=False)
                    dz_g, dy_g = dz_c + gdz, dy_c + gdy
                    dzl_g, dzu_g = dzl_c + gdzl, dzu_c + gdzu
                    ap_g = jnp.minimum(
                        _max_step(jnp, dl, dz_g, sopts.tau, fin_l),
                        _max_step(jnp, du, -dz_g, sopts.tau, fin_u))
                    ad_g = jnp.minimum(
                        _max_step(jnp, zl, dzl_g, sopts.tau, fin_l),
                        _max_step(jnp, zu, dzu_g, sopts.tau, fin_u))
                    acc = (ap_g + ad_g) > (ap_c + ad_c + 0.02)
                    gsel = lambda a, b: jnp.where(acc, a, b)
                    dz_c, dy_c = gsel(dz_g, dz_c), gsel(dy_g, dy_c)
                    dzl_c = gsel(dzl_g, dzl_c)
                    dzu_c = gsel(dzu_g, dzu_c)

            ap = jnp.minimum(_max_step(jnp, dl, dz_c, sopts.tau, fin_l),
                             _max_step(jnp, du, -dz_c, sopts.tau, fin_u))
            ad = jnp.minimum(_max_step(jnp, zl, dzl_c, sopts.tau, fin_l),
                             _max_step(jnp, zu, dzu_c, sopts.tau, fin_u))
            if has_nl:
                a = jnp.minimum(ap, ad)
                ap = ad = a

            mu_t = sigma * mu
            # exact-penalty weight: MONOTONE non-decreasing across
            # iterations (carried in `nu`).  The round-1 stateless
            # 10*(1+|y|_inf) oscillated with the multipliers and let the
            # merit cycle on nonconvex models (the luedtke-1 stall mode);
            # filter-method practice ratchets the penalty only upward.
            nu_pen = jnp.maximum(nu, 10.0 * (1.0 + jnp.max(jnp.abs(y),
                                                           initial=0.0)))

            def trial(scale):
                zt = z + scale * ap * dz_c
                yt = y + scale * ad * dy_c
                zlt = jnp.where(fin_l,
                                jnp.maximum(zl + scale * ad * dzl_c, 1e-300),
                                0.0)
                zut = jnp.where(fin_u,
                                jnp.maximum(zu + scale * ad * dzu_c, 1e-300),
                                0.0)
                if has_nl:
                    rd_xt, rd_st, rpt, _, _ = residuals(A, zt, yt, zlt, zut)
                else:
                    rd_xt, rd_st, rpt = residuals_e(zt, yt, zlt, zut, e)
                errt, mut = kkt_error(zt, yt, zlt, zut, rd_xt, rd_st, rpt)
                errt = errt.astype(f64)
                mut = mut.astype(f64)
                if has_nl:
                    # exact-penalty merit for the line search: barrier
                    # objective + nu * primal infeasibility (Ipopt-style
                    # globalization, simplified to a fixed scale ladder so
                    # it vmaps; reference counterpart: Ipopt's filter
                    # line search behind IpoptEngine)
                    dlt, dut = distances(zt)
                    bar = -mu_t * (
                        jnp.sum(jnp.where(fin_l, jnp.log(dlt), 0.0)) +
                        jnp.sum(jnp.where(fin_u, jnp.log(dut), 0.0)))
                    theta = jnp.sum(jnp.abs(rpt))
                    merit = f_obj(zt[:n], c_in) + bar + nu_pen * theta
                else:
                    merit = jnp.asarray(0.0)
                rvt = jnp.concatenate([rd_xt, rd_st, rpt])
                return (zt, yt, zlt, zut, errt, mut, merit, rvt)

            if has_nl:
                # merit line search over a fixed scale ladder: take the
                # LARGEST scale that decreases the merit, the KKT error,
                # or (crude filter feasibility leg) the primal
                # infeasibility theta by >=10% while infeasible; if none
                # does, take the smallest step (escapes cycling where
                # the full Mehrotra step oscillates — the luedtke-1
                # stall mode, fixed by the theta leg + monotone nu)
                theta0 = jnp.sum(jnp.abs(rp))
                m0 = trial(0.0)[-2]
                cands = [trial(s) for s in (0.01, 0.05, 0.25, 1.0)]
                sel = cands[0]
                for cand in cands[1:]:
                    tht = jnp.sum(jnp.abs(cand[-1][n + m:]))
                    acc = ((cand[-2] < m0 - 1e-12) |
                           (cand[4] < err) |
                           ((theta0 > 1e-6) & (tht < 0.9 * theta0))) & \
                        jnp.isfinite(cand[-2])
                    sel = tuple(jnp.where(acc, a, b)
                                for a, b in zip(cand, sel))
                z_new, y_new, zl_new, zu_new, err2, mu2, _, rvec2 = sel
            else:
                (z_new, y_new, zl_new, zu_new, err2, mu2, _,
                 rvec2) = trial(1.0)

            # NaN guard: if the step blew up, keep the previous iterate and
            # stop (err -> 0 exits the loop; status decided from residuals).
            ok = jnp.isfinite(err2) & jnp.all(jnp.isfinite(z_new))
            z_new = jnp.where(ok, z_new, z)
            y_new = jnp.where(ok, y_new, y)
            zl_new = jnp.where(ok, zl_new, zl)
            zu_new = jnp.where(ok, zu_new, zu)
            err2 = jnp.where(ok, err2, -1.0)
            mu2 = jnp.where(ok, mu2, mu_prev)
            rvec2 = jnp.where(ok, rvec2, rvec)

            if ratchet and cert_proxy is not None:
                # split-f32 SELECTION of the best dual candidate; the
                # sound bound is re-evaluated in f64 from best_y after
                # the loop (the proxy value is never used for pruning)
                db_new = cert_proxy(y_new)
                db_bet = db_new > best_db
                best_db = jnp.where(db_bet, db_new, best_db)
                best_y = jnp.where(db_bet, y_new, best_y)
            if not has_nl:
                # certified Farkas exit (err = -2 sentinel): infeasible
                # lanes stop dragging the whole vmapped batch.  Light
                # (f32) evaluations use a wider margin; the tail uses the
                # split-f32 evaluation at the f64 margin; every exit is
                # confirmed in true f64 after the loop before INFEASIBLE
                # is reported.
                fk = farkas_infeasible(y_new, env32, 1e-4) if light \
                    else farkas_sp(y_new)
                err2 = jnp.where(fk, -2.0, err2)
            # best-state ratchet: an f32-factorized step near convergence
            # (tiny mu -> KKT condition past 1/eps32) can blow the iterate
            # up catastrophically and the f32 loop never recovers.  Track
            # the best-KKT iterate so the solve returns it instead of the
            # blown tail state (sentinel errs < 0 never update it).
            better = (err2 >= 0.0) & (err2 < berr)
            sel = lambda a, b: jnp.where(better, a, b)
            bz2, by2 = sel(z_new, bz), sel(y_new, by)
            bzl2, bzu2 = sel(zl_new, bzl), sel(zu_new, bzu)
            berr2, bmu2 = sel(err2, berr), sel(mu2, bmu)
            # ratchet the penalty upward from the accepted multipliers
            nu2 = jnp.maximum(nu_pen, jnp.minimum(
                1e10, 10.0 * (1.0 + jnp.max(jnp.abs(y_new), initial=0.0))))
            stall2 = jnp.where(better, 0, stall + 1)
            if has_nl:
                # lane restart (vmapped analogue of Ipopt's restoration
                # fallback, IpoptEngine.cpp:668): a lane whose best KKT
                # error has not improved for 25 iterations is boundary-
                # pinned or cycling — re-center it between its best
                # iterate and the box midpoint, reset multipliers, and
                # let the barrier walk restart.  Only the ITERATE is
                # reset; the best-state ratchet and certified bounds
                # keep everything sound.
                # NaN-stopped NL lanes (err2 == -1) restart instead of
                # dying: a blown step is the same pathology.  Restarts
                # are for lanes stuck in BAD attractors only — a lane
                # plateauing at 1e-6 is polishing, and resetting it
                # would throw away a nearly-converged solve (tls4's
                # root NLP regression)
                do_rst = ((stall2 >= 25) & (berr2 > 1e-3)) | \
                    (err2 == -1.0)
                mid = jnp.where(fin_l & fin_u, 0.5 * (lz + uz),
                                jnp.where(fin_l, lz + 1.0,
                                          jnp.where(fin_u, uz - 1.0, 0.0)))
                z_rst = clampz(0.5 * bz2 + 0.5 * mid)
                rst = lambda a, b: jnp.where(do_rst, a, b)
                z_new = rst(z_rst, z_new)
                y_new = rst(jnp.zeros_like(y_new), y_new)
                zl_new = rst(jnp.where(fin_l, 1.0, 0.0), zl_new)
                zu_new = rst(jnp.where(fin_u, 1.0, 0.0), zu_new)
                err2 = rst(jnp.asarray(1e6, dtype=err2.dtype), err2)
                mu2 = rst(jnp.asarray(1.0, dtype=mu2.dtype), mu2)
                stall2 = jnp.where(do_rst, 0, stall2)
            return (z_new, y_new, zl_new, zu_new, k + 1, err2, mu2,
                    best_db, best_y, rvec2, nu2, stall2,
                    bz2, by2, bzl2, bzu2, berr2, bmu2)
          return step

        def cond_to(tol_target):
            def cond(carry):
                k, err, berr = carry[4], carry[5], carry[-2]
                stall = carry[11]
                # loop on the BEST error seen (berr <= err); sentinel
                # errs (< 0: NaN stop / Farkas) exit immediately.  NL
                # lanes plateauing at the ACCEPTABLE level stop burning
                # budget (Ipopt's acceptable_tol semantics — the
                # reference treats STOP_AT_ACCEPTABLE_POINT as solved,
                # IpoptEngine.cpp); 10 stalled iterations ~ Ipopt's
                # acceptable_iter.
                go = (k < opts.max_iters) & (berr > tol_target) & \
                    (err >= 0.0)
                if has_nl:
                    go = go & ~((berr <= opts.acceptable_tol) &
                                (stall >= 10))
                return go
            return cond

        # effective convergence target: an all-f32 tail cannot reach the
        # f64 tolerance (see IPMOptions.tail_tol)
        eff_tol = (max(opts.tol, opts.tail_tol)
                   if (opts.factor_f32 and opts.tail_factor_f32)
                   else opts.tol)

        rd_x0, rd_s0, rp0, _, _ = residuals(A, z0, y0, zl0, zu0)
        err0, mu0 = kkt_error(z0, y0, zl0, zu0, rd_x0, rd_s0, rp0)
        # carried residual vector in the dtype of the FIRST loop (the
        # light phase carries f32 residuals)
        ldt0 = f32 if light_on else f64
        rvec0 = jnp.concatenate([rd_x0, rd_s0, rp0]).astype(ldt0)
        nu0 = jnp.asarray(10.0)
        state0 = (z0, y0, zl0, zu0, 0, err0, mu0, jnp.asarray(-_BIG),
                  y0, rvec0, nu0, 0, z0, y0, zl0, zu0, err0, mu0)
        if opts.factor_f32:
            # two-phase: f32-factorized iterations until moderately
            # converged (f32+refinement stalls once the barrier pushes the
            # equilibrated condition number past ~1/eps32), then a
            # f64-factorized tail to the real tolerance.  Phase 1 is
            # capped at half the budget so a stalling f32 phase cannot
            # starve the tail.
            switch_tol = max(opts.tol, 1e-4)
            cap1 = max(1, opts.max_iters // 2)

            def cond1(carry):
                k, err, berr = carry[4], carry[5], carry[-2]
                return (k < cap1) & (berr > switch_tol) & (err >= 0.0)

            state1 = jax.lax.while_loop(
                cond1, make_step(True, light=light_on, ratchet=False),
                state0)
            # hand the tail the BEST phase-1 iterate, not the last: an
            # ill-conditioned f32 phase can blow up the multipliers and
            # leave the tail worse than where phase 1 passed through.
            # Farkas lanes (err == -2) keep their certificate; NaN-stopped
            # lanes (err == -1) restart the tail from their best state.
            (z1, y1, zl1, zu1, k1, err1, mu1, bdb1, bY1, _rv1, nu1, st1,
             bz1, by1, bzl1, bzu1, berr1, bmu1) = state1
            use_b = (err1 == -1.0) | ((err1 >= 0.0) & (berr1 < err1))
            ub_ = lambda a, b: jnp.where(use_b, a, b)
            zm, ym = ub_(bz1, z1), ub_(by1, y1)
            zlm, zum = ub_(bzl1, zl1), ub_(bzu1, zu1)
            # recompute the carried residuals in f64 at the (possibly
            # best-state-merged) handoff point: the light loop carried
            # them in f32, and merged lanes carry residuals of a
            # different iterate
            if has_nl:
                rxm, rsm, rpm, _, _ = residuals(A, zm, ym, zlm, zum)
            else:
                rxm, rsm, rpm = residuals_e(zm, ym, zlm, zum, env64)
            rvm = jnp.concatenate([rxm, rsm, rpm]).astype(f64)
            state1 = (zm, ym, zlm, zum, k1, ub_(berr1, err1),
                      ub_(bmu1, mu1), bdb1, bY1, rvm, nu1, st1,
                      bz1, by1, bzl1, bzu1, berr1, bmu1)

            def cond_tail(carry):
                # the tail gets its own full budget: phase-1 iters are
                # cheap and must not starve it
                k, err, berr = carry[4], carry[5], carry[-2]
                # keep polishing toward the tight tolerance (f32
                # iterations are cheap; lanes that floor early just run
                # to the cap) — but classify convergence at eff_tol
                return (k < cap1 + opts.max_iters) & (berr > opts.tol) & \
                    (err >= 0.0)

            if opts.tail_factor_f32:
                # all-f32 factorizations: the tail differs from phase 1
                # only by deeper KKT defect correction
                tail_step = make_step(True, dataclasses.replace(
                    opts, kkt_rounds=opts.tail_kkt_rounds))
            else:
                tail_step = make_step(False)
            state2 = jax.lax.while_loop(cond_tail, tail_step, state1)
            polish_step = tail_step
        else:
            polish_step = make_step(False)
            state2 = jax.lax.while_loop(cond_to(opts.tol),
                                        make_step(False), state0)
        if cert_f64 is not None:
            # post-convergence certificate polish: the dual residual rd
            # only contracts by (1 - alpha) ~ 5e-3 per iteration, and the
            # certificate's free-variable box penalty amplifies leftover
            # rd by the ~1e6 domain estimate, so a lane exiting at
            # err ~ 1e-9 can still carry a ~1e-4-loose certified bound.
            # ONE extra ratcheted step shrinks rd (and with it the
            # certificate gap) by another ~200x without perturbing the
            # in-loop trajectory.  Sentinel lanes (Farkas -2 / NaN -1)
            # keep their exited state untouched.
            state3 = polish_step(state2)
            keep2 = state2[5] < 0.0
            state2 = tuple(jnp.where(keep2, a, b)
                           for a, b in zip(state2, state3))
        (z, y, zl, zu, iters, err, mu, best_db, best_y, _rvf, _nuf, _stf,
         bz, by, bzl, bzu, berr, bmu) = state2
        # report the best iterate seen, not the last: a blown f32 step
        # near convergence must not discard an earlier near-optimal state.
        # Farkas lanes (err == -2) keep their certificate state.
        take_b = (err == -1.0) | ((err >= 0.0) & (berr < err))
        tb = lambda a, b: jnp.where(take_b, a, b)
        z, y, zl, zu = tb(bz, z), tb(by, y), tb(bzl, zl), tb(bzu, zu)
        err, mu = tb(berr, err), tb(bmu, mu)

        x = z[:n]
        obj = f_obj(x, c_in) + sp.obj_const

        # ---- final f64 recomputation ------------------------------------
        # loop errors may have been measured in f32 (light phase):
        # statuses, trust margins and certified bounds are re-derived in
        # f64 here so no sound decision depends on f32 noise
        rd_xf, rd_sf, rpf, _, _ = residuals(A, z, y, zl, zu)
        err_f, mu_f = kkt_error(z, y, zl, zu, rd_xf, rd_sf, rpf)
        sent = err < 0.0
        err = jnp.where(sent, err, err_f)
        mu = jnp.where(sent, mu, mu_f)

        # ---- certified dual bound (exact for LP/PSD-QP) -----------------
        # margin adapts to the ACHIEVED error: lanes that converge tightly
        # keep tight trust bounds; only lanes flooring at the f32 limit pay
        trust = jnp.where((err <= eff_tol * 100) & (err >= 0.0),
                          obj - jnp.maximum(1e-7, 10.0 * err) *
                          (1.0 + jnp.abs(obj)), -_BIG)
        # best_db was a split-f32 selection PROXY; the sound bound is the
        # true-f64 certificate at the carried best_y and the final y
        if is_lp:
            cert_db = jnp.maximum(dual_cert_bound(best_y, env64),
                                  dual_cert_bound(y, env64))
            dual_bound = cert_db
        elif q_psd:
            # certified bound from the Q-eigendecomposition; a converged
            # KKT point of a convex QP also supports its own objective
            cert_db = jnp.maximum(qp_cert_bound(best_y, env64),
                                  qp_cert_bound(y, env64))
            dual_bound = jnp.maximum(cert_db, trust)
        else:
            # convex NLP: trust the converged KKT point with a tolerance
            # margin (the reference trusts Ipopt the same way).
            cert_db = -_BIG
            dual_bound = trust

        prim_err = jnp.max(jnp.abs(rpf), initial=0.0)
        # an empty bound box (possible after branching/FBBT race) is an
        # infeasible node, not a solvable problem
        empty_box = jnp.any(lz > uz + 1e-12)
        # every in-loop Farkas exit is re-confirmed by the f64
        # certificate; unconfirmed lanes (f32 false positive) fall back
        # to ITERATION_LIMIT with their certified bounds — sound
        farkas = err == -2.0
        if not has_nl:
            farkas = farkas & farkas_infeasible(y, env64, 1e-5)
        converged = (err <= eff_tol) & (err >= 0.0) & ~empty_box
        if has_nl:
            # acceptable-level acceptance (see acceptable_tol): scaled
            # KKT error at the acceptable threshold AND primal feasible
            converged = converged | (
                (err <= opts.acceptable_tol) & (err >= 0.0) &
                (prim_err <= 1e-6) & ~empty_box)
        if not has_nl:
            # certificate-based optimality: when the CERTIFIED dual bound
            # (never `trust`, which is derived from obj) meets the
            # objective of a primal-feasible point, the lane is solved to
            # tolerance no matter where the f32 KKT error floored.  This
            # is how LP solvers certify; it keeps b&b lb tight when the
            # f32 tail stalls above eff_tol.
            gap_closed = cert_db >= obj - eff_tol * (1.0 + jnp.abs(obj))
            cert_opt = gap_closed & (prim_err <= 1e-6) & (err >= 0.0) & \
                ~empty_box
            converged = converged | cert_opt
        if has_nl:
            # no certificate exists for nonlinear rows: keep the
            # mu-collapse heuristic (the reference trusts Ipopt's
            # infeasibility the same way)
            heur_infeas = (~converged) & (prim_err > 1e-6) & \
                (mu < opts.infeas_mu)
        else:
            # LP/QP: infeasibility claims REQUIRE the Farkas certificate
            # — a stalled f32 lane with collapsed mu is just unresolved
            heur_infeas = dual_bound > 1e15
        infeasible = empty_box | farkas | heur_infeas
        dual_bound = jnp.where(empty_box | farkas, _BIG, dual_bound)
        status = jnp.where(
            converged,
            EngineStatus.SOLVED_OPTIMAL,
            jnp.where(infeasible, EngineStatus.SOLVED_INFEASIBLE,
                      EngineStatus.ITERATION_LIMIT)).astype(jnp.int32)
        return IPMResult(x=x, obj=obj, dual_bound=dual_bound, y=y,
                         status=status, iters=iters, kkt_err=err)

    def solve_one(A, clb, cub, vlb, vub, x0, y0=None):
        return solve_impl(A, clb, cub, vlb, vub, x0, c_const, y0)

    solve_one.with_objective = solve_impl
    return solve_one


def build_batch_solver(sp: StagedProblem, opts: IPMOptions = IPMOptions(),
                       ) -> Callable:
    """Returns solve(A, clb, cub, vlb_b, vub_b, x0_b=None) -> IPMResult.

    A/clb/cub are traced (cut rows change their *values* without
    recompiling); vlb_b/vub_b have a leading batch axis.  The returned
    callable is jit-compiled with the batch dimension static per shape.
    """
    import jax
    import jax.numpy as jnp

    n = sp.n
    m = sp.m
    solve_one = build_single_solver(sp, opts)

    @functools.partial(jax.jit)
    def solve_batch(A, clb, cub, vlb_b, vub_b, x0_b):
        # pack every output into ONE array: each device->host fetch costs
        # ~0.1-0.5 s of pure LATENCY through the tunnel regardless of
        # size (CLAUDE.md), and nested engine calls (QG fix-int oracle,
        # multistart lanes, heuristic dives) read 5+ fields per solve —
        # same trick as bnb/step.py::pack_step_result, measured 5x on
        # the tls4 host phase
        r = jax.vmap(solve_one, in_axes=(None, None, None, 0, 0, 0))(
            A, clb, cub, vlb_b, vub_b, x0_b)
        f = r.x.dtype
        # the certified dual bound must never be silently downcast: a
        # round-to-nearest into f32 can round UP and break the sound-
        # pruning invariant.  x64 is required for this packed layout.
        assert f == jnp.float64, (
            "build_batch_solver requires jax_enable_x64 (packed result "
            f"would downcast certified bounds to {f})")
        return jnp.concatenate(
            [r.x, r.y, r.obj[:, None].astype(f),
             r.dual_bound[:, None].astype(f),
             r.status[:, None].astype(f), r.iters[:, None].astype(f),
             r.kkt_err[:, None].astype(f)], axis=1)

    def _unpack(arr: "np.ndarray") -> IPMResult:
        arr = np.asarray(arr)
        return IPMResult(
            x=arr[:, :n], y=arr[:, n:n + m],
            obj=arr[:, n + m], dual_bound=arr[:, n + m + 1],
            status=arr[:, n + m + 2].astype(np.int32),
            iters=arr[:, n + m + 3].astype(np.int32),
            kkt_err=arr[:, n + m + 4])

    def solve(A, clb, cub, vlb_b, vub_b, x0_b=None):
        A = jnp.asarray(A)
        clb = jnp.asarray(clb)
        cub = jnp.asarray(cub)
        vlb_b = jnp.asarray(vlb_b)
        vub_b = jnp.asarray(vub_b)
        if x0_b is None:
            if len(sp.nl_rows) or sp.obj_nl is not None:
                # cold NL starts use the box midpoint: zero starts land
                # nonconvex models in infeasible merit attractors
                # (luedtke-1 converges from the midpoint, stalls from 0)
                lo = jnp.where(jnp.isfinite(vlb_b), vlb_b, -1.0)
                hi = jnp.where(jnp.isfinite(vub_b), vub_b, 1.0)
                x0_b = 0.5 * (lo + hi)
            else:
                x0_b = jnp.zeros((vlb_b.shape[0], n))
        return _unpack(solve_batch(A, clb, cub, vlb_b, vub_b,
                                   jnp.asarray(x0_b)))

    # async surface for callers that overlap host work with the solve —
    # same input normalization / x0 defaulting as solve() (a raw
    # solve_batch alias would give a jit arity error to callers omitting
    # x0 and re-upload numpy args without jnp.asarray)
    def dispatch(A, clb, cub, vlb_b, vub_b, x0_b=None):
        A = jnp.asarray(A)
        clb = jnp.asarray(clb)
        cub = jnp.asarray(cub)
        vlb_b = jnp.asarray(vlb_b)
        vub_b = jnp.asarray(vub_b)
        if x0_b is None:
            if len(sp.nl_rows) or sp.obj_nl is not None:
                lo = jnp.where(jnp.isfinite(vlb_b), vlb_b, -1.0)
                hi = jnp.where(jnp.isfinite(vub_b), vub_b, 1.0)
                x0_b = 0.5 * (lo + hi)
            else:
                x0_b = jnp.zeros((vlb_b.shape[0], n))
        return solve_batch(A, clb, cub, vlb_b, vub_b, jnp.asarray(x0_b))

    solve.dispatch = dispatch
    solve.unpack = _unpack
    return solve
